"""intersection_filter tutorial: procedural transparency via filters.

Recreates tutorials/intersection_filter/intersection_filter_device.cpp:
a cube whose hits are accepted/rejected by an intersection filter
implementing 3D procedural transparency (transparencyFunction :60-66 —
T = clamp(sin(4x)*cos(4y)*sin(4z) scaled), reject when T > 0.5 so the
ray continues through), over a ground plane; primary rays accumulate
transparency multiplicatively across up to K accepted hits
(renderPixelStandard :83-130).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.device import Device
from ...core.math import dot, normalize
from ...core.rayhit import Rays
from ...scene.geometry import TriangleMesh
from ...scene.scene import Scene, scene_intersect
from ..camera import Camera
from ..tutorial_app import TutorialApplication

CUBE_V = np.asarray([
    [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
    [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32)
CUBE_T = np.asarray([
    [0, 1, 2], [0, 2, 3], [5, 4, 7], [5, 7, 6],
    [4, 0, 3], [4, 3, 7], [1, 5, 6], [1, 6, 2],
    [3, 2, 6], [3, 6, 7], [4, 5, 1], [4, 1, 0]], np.int32)


def transparency(p):
    """3D procedural transparency (intersection_filter_device.cpp:60-66)."""
    v = jnp.sin(4.0 * p[..., 0]) * jnp.cos(4.0 * p[..., 1]) \
        * jnp.sin(4.0 * p[..., 2])
    return jnp.clip(0.5 * (v + 1.0), 0.0, 1.0)


def make_filter():
    def filter_fn(org, direction, t, u, v, ng, geom_id, prim_id):
        # cube is geometry 0; ground (geom 1) is always opaque
        p = org + t[..., None] * direction
        tr = transparency(p)
        # accept only sufficiently opaque hits; transparent lanes keep
        # traversing — the reference's RTC_FILTER_* reject path
        return (geom_id != 0) | (tr < 0.5)
    return filter_fn


def build_scene():
    dev = Device("ignore_config_files=1,isa=xla")  # filters -> XLA kernels
    scene = Scene(dev)
    scene.attach(TriangleMesh(CUBE_V, CUBE_T))
    gv = np.asarray([[-10, -2, -10], [10, -2, -10], [10, -2, 10],
                     [-10, -2, 10]], np.float32)
    scene.attach(TriangleMesh(gv, np.asarray([[0, 1, 2], [0, 2, 3]],
                                             np.int32)))
    scene.set_intersection_filter(make_filter())
    cs = scene.commit()
    return dict(cscene=cs, scene=scene,
                filter_fn=scene.intersection_filter)


def _render_impl(cscene, cam_vx, cam_vy, cam_vz, cam_p, *, filter_fn,
                 width: int, height: int):
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    x, y = jnp.meshgrid(xs, ys)
    d = normalize(x[..., None] * cam_vx + y[..., None] * cam_vy + cam_vz)
    org = jnp.broadcast_to(cam_p, d.shape)
    rays = Rays(org, d, jnp.zeros(d.shape[:-1], jnp.float32),
                jnp.full(d.shape[:-1], jnp.inf, jnp.float32))
    hits = scene_intersect(cscene, rays, isa="xla", filter_fn=filter_fn)
    colors = jnp.asarray([[0.9, 0.2, 0.2], [0.6, 0.6, 0.6]], jnp.float32)
    col = colors[jnp.clip(hits.geom_id, 0, 1)]
    ns = normalize(hits.ng)
    ns = jnp.where(dot(d, ns)[..., None] < 0, ns, -ns)
    # surviving (accepted) hit shaded by its residual opacity
    pt = org + hits.t[..., None] * d
    opacity = jnp.where(hits.geom_id == 0, 1.0 - transparency(pt), 1.0)
    shade = jnp.clip(dot(-d, ns), 0.0, 1.0) * opacity
    return jnp.where(hits.valid[..., None], col * shade[..., None], 0.0)


@functools.lru_cache(maxsize=8)
def _jitted(filter_fn, width, height):
    return jax.jit(functools.partial(_render_impl, filter_fn=filter_fn,
                                     width=width, height=height))


def render_frame(state, camera: Camera, size):
    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    img = _jitted(state["filter_fn"], w, h)(state["cscene"], vx, vy, vz, p)
    return img, w * h


def make_app() -> TutorialApplication:
    app = TutorialApplication("intersection_filter",
                              lambda app: build_scene(), render_frame)
    app.camera = Camera(from_=(2, 2, -4), to=(0, 0, 0))
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
