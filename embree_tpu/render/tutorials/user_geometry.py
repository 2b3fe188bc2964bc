"""user_geometry tutorial: analytic spheres via user callbacks.

Recreates tutorials/user_geometry/user_geometry_device.cpp: analytic
spheres registered through the user-geometry callback pair
(sphereBoundsFunc :288-299, sphereIntersectFunc :301-360 — quadratic
ray/sphere solve taking the nearer root in (tnear, tfar)), plus a
triangle ground plane, eyelight shading with per-sphere colors and
point-light shadows via occluded() (renderPixelStandard :820-860).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.device import Device
from ...core.math import dot, normalize
from ...core.rayhit import Rays
from ...scene.geometry import TriangleMesh, UserGeometry
from ...scene.scene import Scene, scene_intersect, scene_occluded
from ..camera import Camera
from ..tutorial_app import TutorialApplication

SPHERES = np.asarray([
    [0.0, 0.0, 0.0, 1.0],
    [2.2, 0.0, 0.0, 0.6],
    [-2.2, 0.0, 0.0, 0.6],
    [0.0, 0.0, 2.2, 0.6],
], np.float32)   # (x, y, z, r)


def sphere_bounds(prim_ids):
    c = jnp.asarray(SPHERES)[prim_ids, :3]
    r = jnp.asarray(SPHERES)[prim_ids, 3:4]
    return c - r, c + r


def sphere_intersect(prim_id, rays: Rays, tfar):
    s = jnp.asarray(SPHERES)[prim_id]
    c, r = s[:3], s[3]
    o = rays.org - c
    a = dot(rays.dir, rays.dir)
    b = 2.0 * dot(o, rays.dir)
    cc = dot(o, o) - r * r
    disc = b * b - 4 * a * cc
    ok = disc >= 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    den = jnp.where(a != 0, 2 * a, 1.0)
    t0 = (-b - sq) / den
    t1 = (-b + sq) / den
    # nearer root inside (tnear, tfar) — :330-340
    t = jnp.where((t0 > rays.tnear) & (t0 < tfar), t0,
                  jnp.where((t1 > rays.tnear) & (t1 < tfar), t1, jnp.inf))
    valid = ok & jnp.isfinite(t)
    pt = rays.org + t[..., None] * rays.dir
    ng = pt - c
    z = jnp.zeros_like(t)
    return valid, jnp.where(valid, t, tfar), z, z, \
        jnp.where(valid[..., None], ng, 0.0)


def build_scene():
    dev = Device("ignore_config_files=1")
    scene = Scene(dev)
    scene.attach(UserGeometry(SPHERES.shape[0], sphere_bounds,
                              sphere_intersect))
    gv = np.asarray([[-10, -2, -10], [10, -2, -10], [10, -2, 10],
                     [-10, -2, 10]], np.float32)
    scene.attach(TriangleMesh(gv, np.asarray([[0, 1, 2], [0, 2, 3]],
                                             np.int32)))
    cs = scene.commit()
    colors = np.asarray([[1.0, 0.2, 0.2], [0.2, 1.0, 0.2], [0.2, 0.2, 1.0],
                         [1.0, 1.0, 0.2], [0.8, 0.8, 0.8]], np.float32)
    return dict(cscene=cs, scene=scene, colors=jnp.asarray(colors))


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render(cscene, colors, cam_vx, cam_vy, cam_vz, cam_p,
           *, width: int, height: int):
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    x, y = jnp.meshgrid(xs, ys)
    d = normalize(x[..., None] * cam_vx + y[..., None] * cam_vy + cam_vz)
    org = jnp.broadcast_to(cam_p, d.shape)
    rays = Rays(org, d, jnp.zeros(d.shape[:-1], jnp.float32),
                jnp.full(d.shape[:-1], jnp.inf, jnp.float32))
    hits = scene_intersect(cscene, rays, coherent=True)

    # sphere prims -> color by prim id; ground -> last color
    is_user = hits.geom_id == 0
    cidx = jnp.where(is_user, jnp.clip(hits.prim_id, 0, 3), 4)
    col = colors[cidx]
    ns = normalize(hits.ng)
    ns = jnp.where(dot(d, ns)[..., None] < 0, ns, -ns)

    # point light + shadow rays (user_geometry_device.cpp:840-855)
    light = jnp.asarray([4.0, 6.0, -3.0])
    pt = org + hits.t[..., None] * d
    ld = light - pt
    dist = jnp.sqrt(dot(ld, ld))
    ldn = ld / dist[..., None]
    sorg = pt + 1e-3 * ns * jnp.sign(dot(ns, ldn))[..., None]
    srays = Rays(sorg, ldn, jnp.zeros_like(hits.t), dist)
    shadowed = scene_occluded(cscene, srays, coherent=True)

    diff = jnp.clip(dot(ldn, ns), 0.0, 1.0)
    lit = jnp.where(shadowed | ~hits.valid, 0.0, diff)
    shade = 0.15 + 0.85 * lit
    return jnp.where(hits.valid[..., None], col * shade[..., None], 0.0)


def render_frame(state, camera: Camera, size):
    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    img = render(state["cscene"], state["colors"], vx, vy, vz, p,
                 width=w, height=h)
    return img, 2 * w * h  # primary + shadow


def make_app() -> TutorialApplication:
    app = TutorialApplication("user_geometry", lambda app: build_scene(),
                              render_frame)
    app.camera = Camera(from_=(2, 3, -6), to=(0, 0, 0))
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
