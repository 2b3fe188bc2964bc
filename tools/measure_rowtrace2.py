"""Measure rowtrace v2 at 1M prims on the chip; correctness vs packet."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.core.rayhit import Rays
    from embree_tpu.traverse.rowtrace2 import intersect_rowtrace2
    from embree_tpu.verify.fixtures import triangle_sphere

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 707
    nrays = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 20)
    rng = np.random.default_rng(0xBE7C4)
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, res)
    t0 = time.perf_counter()
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()
    ts = cs.rowtrace
    print(f"tris={len(idx)} commit={time.perf_counter()-t0:.1f}s "
          f"treelets={ts.num_treelets} mids={ts.num_mids} fan={ts.fan}",
          flush=True)

    d = rng.normal(size=(nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (nrays, 3)).astype(np.float32)
    rays = et.make_rays(org, d)
    flat = Rays(rays.org.reshape(-1, 3), rays.dir.reshape(-1, 3),
                rays.tnear.reshape(-1), rays.tfar.reshape(-1))

    t0 = time.perf_counter()
    t, prim = intersect_rowtrace2(ts, flat)
    hits = int(np.asarray((prim >= 0).sum()))
    print(f"first call (compiles): {time.perf_counter()-t0:.1f}s "
          f"hits={hits}", flush=True)

    import jax.numpy as jnp
    sumfn = jax.jit(lambda a: jnp.sum(a))
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        t, prim = intersect_rowtrace2(ts, flat)
        _ = float(sumfn(t))     # forced host sync (block_until_ready lies)
    dt = (time.perf_counter() - t0) / reps
    print(f"rowtrace2 fwd: {dt*1e3:.1f} ms => {nrays/dt/1e6:.2f} Mray/s",
          flush=True)

main()
