"""Careful microbench: distinct inputs per rep, sub sweep, bwd alternatives."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.scene.scene import scene_intersect
from embree_tpu.traverse.pallas_packet import (_ray_tiles, _run_intersect,
                                               pack_scene)
from embree_tpu.traverse.stream import sort_rays
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
    print(f"{name:40s} {dt*1e3:8.2f} ms   {n/dt/1e6:7.2f} Mray/s")


# sort cost
timeit("sort_rays", lambda r: sort_rays(r, cs.world_lower, cs.world_upper),
       [(r,) for r in raysets])

sorted_sets = [sort_rays(r, cs.world_lower, cs.world_upper)[0]
               for r in raysets]
jax.block_until_ready(sorted_sets)

# kernel-only, sub sweep (sorted rays)
for sub in (16, 32, 64):
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

# full forward via scene.intersect (distinct inputs)
fwd = jax.jit(lambda c, r: scene_intersect(c, r, isa="default"))
timeit("scene_intersect full (incoherent)", fwd,
       [(cs, r) for r in raysets])
