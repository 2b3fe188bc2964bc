"""Kernel-only A/B harness: BVH4 vs BVH8 x sub on the sorted 1M
incoherent workload."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.traverse.pallas_packet import (_ray_tiles, _pallas_call_v3,
                                               VMEM_TABLE_BUDGET)
from embree_tpu.traverse.stream import sort_rays_stream
from embree_tpu.verify.fixtures import triangle_sphere

rng = np.random.default_rng(0xBE7C4)
verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, 40)

n = 1 << 20
REPS = 6


def commit(cfg):
    dev = et.Device(cfg)
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    return scene.commit()


cs4 = commit("ignore_config_files=1,tri_accel=bvh4.triangle4")
cs8 = commit("ignore_config_files=1,tri_accel=bvh8.triangle4")
print("bvh4 nodes", cs4.pallas.nodes.shape[0], "width", cs4.pallas.width)
print("bvh8 nodes", cs8.pallas.nodes.shape[0], "width", cs8.pallas.width)


def mkrays(seed):
    r = np.random.default_rng(seed)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = r.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    return et.make_rays(org, d)


sorted_sets = []
for i in range(REPS):
    sr, _ = sort_rays_stream(mkrays(i), cs4.world_lower, cs4.world_upper)
    sorted_sets.append(sr)
jax.block_until_ready(sorted_sets)


def timeit(name, f, argsets):
    out0 = jax.block_until_ready(f(*argsets[0]))
    t0 = time.perf_counter()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(argsets)
    stats = np.asarray(out0[2])
    iters = stats[:, 0].astype(np.int64)
    lt = stats[:, 1].astype(np.int64)
    print(f"{name:36s} {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s  "
          f"iters tot={iters.sum()} max={iters.max()}  "
          f"ltests tot={lt.sum()}")


# correctness cross-check first (interpret=False but on-device compare)
from embree_tpu.traverse.pallas_packet import intersect_pallas_raw
t4, p4 = intersect_pallas_raw(cs4.pallas, sorted_sets[0])
t8, p8 = intersect_pallas_raw(cs8.pallas, sorted_sets[0])
t4, p4, t8, p8 = map(np.asarray, (t4, p4, t8, p8))
mism = (np.abs(np.where(np.isfinite(t4), t4, 0) -
               np.where(np.isfinite(t8), t8, 0)) > 1e-4).mean()
print(f"bvh4-vs-bvh8 t mismatch frac: {mism:.2e} "
      f"(hit frac {np.mean(p4 >= 0):.3f} vs {np.mean(p8 >= 0):.3f})")

for cs, label in ((cs4, "bvh4"),):
    for sub in (64,):
        for K in (8, 16, 24, 32):
            tilesets = []
            for r in sorted_sets:
                tiles, R, nb = _ray_tiles(r, sub)
                tilesets.append((tiles, nb))
            hbm = cs.pallas.vmem_bytes > VMEM_TABLE_BUDGET
            params = jnp.asarray([262144], jnp.int32)
            W = cs.pallas.width
            nodes, tdata = cs.pallas.nodes, cs.pallas.tdata

            def f(tiles, nb, sub=sub, K=K, hbm=hbm, W=W, nodes=nodes,
                  tdata=tdata):
                return _pallas_call_v3(False, nb, False, sub, hbm, K, W)(
                    params, nodes, tdata, *tiles)

            fj = jax.jit(f, static_argnums=(1,))
            try:
                timeit(f"{label} sub={sub} K={K}", fj, tilesets)
            except Exception as e:
                print(f"{label} sub={sub} K={K} FAILED: "
                      f"{type(e).__name__}: {e}")
