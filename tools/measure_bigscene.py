"""Large-scene fast-path gate (VERDICT r4 #4): a 16M-prim scene must
traverse on rowtrace2 within 1.5x of the 1M-prim Mray/s."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.core.rayhit import Rays
    from embree_tpu.traverse.rowtrace2 import intersect_rowtrace2
    from embree_tpu.verify.fixtures import triangle_sphere

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 2840  # ~16.1M tris
    nrays = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 21)
    rng = np.random.default_rng(0xBE7C4)
    t0 = time.perf_counter()
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, res)
    print(f"tris={len(idx)} gen={time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    dev = et.Device("ignore_config_files=1,tri_accel=bvh4.rowtrace")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()
    ts = cs.rowtrace
    assert ts is not None, "scene fell off the rowtrace path"
    print(f"commit={time.perf_counter()-t0:.1f}s treelets={ts.num_treelets} "
          f"mids={ts.num_mids} fan={ts.fan} "
          f"hbm={ts.hbm_bytes/1e9:.2f} GB", flush=True)

    d = rng.normal(size=(nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (nrays, 3)).astype(np.float32)
    flat = Rays(jnp.asarray(org), jnp.asarray(d),
                jnp.zeros((nrays,), jnp.float32),
                jnp.full((nrays,), np.inf, jnp.float32))
    t0 = time.perf_counter()
    t, prim = intersect_rowtrace2(ts, flat)
    hits = int(np.asarray((prim >= 0).sum()))
    print(f"first call: {time.perf_counter()-t0:.1f}s hits={hits}",
          flush=True)
    su = jax.jit(lambda a: jnp.sum(a))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        t, prim = intersect_rowtrace2(ts, flat)
        _ = float(su(t))
    dt = (time.perf_counter() - t0) / reps
    print(f"rowtrace2 fwd @{len(idx)} tris: {dt*1e3:.1f} ms => "
          f"{nrays/dt/1e6:.2f} Mray/s", flush=True)


main()
