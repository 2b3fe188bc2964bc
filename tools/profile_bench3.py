"""Decompose the full fast path stage by stage; sweep bigger sub."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.scene.scene import scene_intersect
from embree_tpu.traverse.packet import _finalize_hits
from embree_tpu.traverse.pallas_packet import (_ray_tiles, _run_intersect,
                                               intersect_pallas_raw)
from embree_tpu.traverse.stream import sort_rays_perm
from embree_tpu.core.rayhit import Rays
from embree_tpu.verify.fixtures import triangle_sphere

rng = np.random.default_rng(0xBE7C4)
verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, 40)
dev = et.Device("ignore_config_files=1")
scene = et.Scene(dev)
scene.attach(et.TriangleMesh(verts, idx))
cs = scene.commit()

n = 1 << 20
REPS = 6


def mkrays(seed):
    r = np.random.default_rng(seed)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = r.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    return et.make_rays(org, d)


raysets = [mkrays(i) for i in range(REPS)]


def timeit(name, f, argsets):
    jax.block_until_ready(f(*argsets[0]))
    t0 = time.perf_counter()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(argsets)
    print(f"{name:44s} {dt*1e3:8.2f} ms   {n/dt/1e6:7.2f} Mray/s")


# stage 1: sort only (force full materialization via sums)
@jax.jit
def s1(r):
    srays, perm, inv = sort_rays_perm(r, cs.world_lower, cs.world_upper)
    return srays, perm, inv


timeit("s1 sort_rays_perm", s1, [(r,) for r in raysets])

# stage 2: sort + kernel raw
@jax.jit
def s2(r):
    srays, perm, inv = sort_rays_perm(r, cs.world_lower, cs.world_upper)
    t_s, prim_s = intersect_pallas_raw(cs.pallas, srays)
    return t_s, prim_s


timeit("s2 sort + kernel", s2, [(r,) for r in raysets])

# stage 3: + unsort (payload sort)
from embree_tpu.traverse.stream import sort_rays_stream, unsort_by_perm


@jax.jit
def s3(r):
    srays, perm = sort_rays_stream(r, cs.world_lower, cs.world_upper)
    t_s, prim_s = intersect_pallas_raw(cs.pallas, srays)
    return unsort_by_perm(perm, t_s, prim_s)


timeit("s3 sort + kernel + unsort", s3, [(r,) for r in raysets])

# stage 4: + finalize (the full fast path)
@jax.jit
def s4(r):
    flat = Rays(r.org.reshape(-1, 3), r.dir.reshape(-1, 3),
                r.tnear.reshape(-1), r.tfar.reshape(-1))
    srays, perm = sort_rays_stream(flat, cs.world_lower, cs.world_upper)
    t_s, prim_s = intersect_pallas_raw(cs.pallas, srays)
    t_u, prim_u = unsort_by_perm(perm, t_s, prim_s)
    return _finalize_hits(cs.tris, flat, t_u, prim_u)


timeit("s4 full fast path (manual)", s4, [(r,) for r in raysets])

# bigger subs on sorted rays
sorted_sets = []
for r in raysets:
    sr, _, _ = s1(r)
    sorted_sets.append(sr)
jax.block_until_ready(sorted_sets)

for sub in (64, 128):
    tilesets = []
    for r in sorted_sets:
        tiles, R, nb = _ray_tiles(r, sub)
        tilesets.append((tiles, nb))
    f = jax.jit(lambda tiles, nb, sub=sub: _run_intersect(
        cs.pallas, tiles, nb, False, sub), static_argnums=(1,))
    try:
        timeit(f"kernel sorted sub={sub}", f, tilesets)
    except Exception as e:
        print(f"kernel sub={sub} FAILED: {type(e).__name__}: {e}")
