"""Decompose the triangle_geometry frame: where do 400 ms go on a
14-triangle scene?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from embree_tpu.core.rayhit import Rays
from embree_tpu.render.camera import Camera, pixel_morton_order
from embree_tpu.render.tutorials import triangle_geometry as tg
from embree_tpu.scene.scene import scene_intersect, scene_occluded

state = tg.build_scene()
cs = state["cscene"]
cam = Camera(from_=(1.5, 1.5, -1.5), to=(0, 0, 0))
w = h = 1024
vx, vy, vz, p = cam.ispc_camera(w, h)
R = w * h


def timeit(name, f, *args, reps=5):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.2f} ms")


@jax.jit
def gen_rays(vx, vy, vz, p):
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    x, y = xg.reshape(-1), yg.reshape(-1)
    d = x[..., None] * vx + y[..., None] * vy + vz
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    org = jnp.broadcast_to(p, d.shape)
    return Rays(org, d, jnp.zeros((R,), jnp.float32),
                jnp.full((R,), jnp.inf, jnp.float32))


timeit("gen_rays", gen_rays, vx, vy, vz, p)
rays = jax.block_until_ready(gen_rays(vx, vy, vz, p))


@jax.jit
def prim(r):
    return scene_intersect(cs, r, coherent=True)


timeit("primary intersect (row order)", prim, rays)
hits = jax.block_until_ready(prim(rays))


@jax.jit
def prim_sorted(r):
    return scene_intersect(cs, r)  # stream-sorted path


timeit("primary intersect (sorted path)", prim_sorted, rays)


@jax.jit
def shadow(r, t):
    light = jnp.asarray([-1.0, -1.0, -1.0], jnp.float32)
    light = light / jnp.linalg.norm(light)
    hp = r.org + t[..., None] * r.dir
    sr = Rays(hp, jnp.broadcast_to(-light, r.dir.shape),
              jnp.full((R,), 1e-3, jnp.float32),
              jnp.full((R,), jnp.inf, jnp.float32))
    return scene_occluded(cs, sr, coherent=True)


timeit("shadow occluded (coherent)", shadow, rays, hits.t)


@jax.jit
def full(vx, vy, vz, p):
    return tg.render(cs, state["face_colors"], state["prim_offset"],
                     vx, vy, vz, p, width=w, height=h)


timeit("full frame (row order)", full, vx, vy, vz, p)

perm, inv = pixel_morton_order(w, h)
permj, invj = jnp.asarray(perm), jnp.asarray(inv)


@jax.jit
def full_m(vx, vy, vz, p, permj, invj):
    return tg.render(cs, state["face_colors"], state["prim_offset"],
                     vx, vy, vz, p, permj, invj, width=w, height=h)


timeit("full frame (morton)", full_m, vx, vy, vz, p, permj, invj)
