"""Measure the per-lane treelet path (rowtrace) at 1M prims / 1M rays."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import embree_tpu as et
    from embree_tpu.core.rayhit import Rays
    from embree_tpu.traverse.rowtrace import intersect_rowtrace
    from embree_tpu.verify.fixtures import triangle_sphere

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 707
    rng = np.random.default_rng(0xBE7C4)
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, res)
    print(f"tris={len(idx)}", flush=True)
    t0 = time.perf_counter()
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()
    ts = cs.rowtrace
    print(f"commit={time.perf_counter()-t0:.1f}s rowtrace={ts is not None}",
          flush=True)
    if ts is None:
        return
    print(f"treelets={ts.num_treelets} mids={ts.num_mids} fan={ts.fan} "
          f"blocks={ts.hbm_bytes/1e6:.0f}MB", flush=True)

    n = 1 << 20
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    rays = et.make_rays(org, d)
    flat = Rays(rays.org.reshape(-1, 3), rays.dir.reshape(-1, 3),
                rays.tnear.reshape(-1), rays.tfar.reshape(-1))

    t0 = time.perf_counter()
    t, prim = intersect_rowtrace(ts, flat)
    t = jax.block_until_ready(t)
    print(f"first call (compiles): {time.perf_counter()-t0:.1f}s "
          f"hits={int((np.asarray(prim) >= 0).sum())}", flush=True)

    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        t, prim = intersect_rowtrace(ts, flat)
    jax.block_until_ready(t)
    dt = (time.perf_counter() - t0) / reps
    print(f"rowtrace fwd: {dt*1e3:.1f} ms => {n/dt/1e6:.2f} Mray/s",
          flush=True)

    # sanity: against the packet kernel result
    from embree_tpu.scene.scene import scene_intersect
    h = scene_intersect(cs, rays, isa="default")
    hv = jax.block_until_ready(h.valid)
    m = np.asarray(hv)
    mism = (np.asarray(prim) >= 0) != m
    print(f"valid mismatch vs packet path: {int(mism.sum())}/{n}", flush=True)
    tt = np.asarray(t)[m & ~mism]
    rt = np.asarray(h.t)[m & ~mism]
    bad = np.abs(tt - rt) > 1e-3 * np.maximum(1.0, np.abs(rt))
    print(f"t mismatch: {int(bad.sum())}", flush=True)


main()
