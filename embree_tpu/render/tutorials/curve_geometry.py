"""curve_geometry tutorial: round B-spline hair loop over a ground plane.

Recreates tutorials/curve_geometry/curve_geometry_device.cpp: one closed
loop of 6 cubic B-spline curves sharing a 9-point control polygon with
varying radius (hair_vertices :31-45), per-control-point colors
(hair_vertex_colors :47-59) interpolated along the curve, eyelight-shaded
above a triangulated ground plane (:78-101).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.device import Device
from ...core.math import dot, normalize
from ...core.rayhit import Rays
from ...scene.curves import BSplineCurves
from ...scene.geometry import TriangleMesh
from ...scene.scene import Scene, scene_intersect
from ..camera import Camera
from ..tutorial_app import TutorialApplication

W = 2.0
HAIR_VERTICES = np.asarray([
    [-1, 0, -W, 0.2],
    [0, -1, 0, 0.2], [1, 0, W, 0.2], [-1, 0, W, 0.2],
    [0, 1, 0, 0.6], [1, 0, -W, 0.2], [-1, 0, -W, 0.2],
    [0, -1, 0, 0.2], [1, 0, W, 0.2]], np.float32)
HAIR_COLORS = np.asarray([
    [1, 1, 0],
    [1, 0, 0], [1, 1, 0], [0, 0, 1],
    [1, 1, 1], [1, 0, 0], [1, 1, 0],
    [1, 0, 0], [1, 1, 0]], np.float32)
HAIR_INDICES = np.arange(6, dtype=np.int32)


def build_scene(app=None):
    dev = Device("ignore_config_files=1")
    scene = Scene(dev)
    # ground plane (addGroundPlane)
    gv = np.asarray([[-10, -2, -10], [-10, -2, 10], [10, -2, -10],
                     [10, -2, 10]], np.float32)
    gt = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
    gid_plane = scene.attach(TriangleMesh(gv, gt))
    gid_curve = scene.attach(BSplineCurves(HAIR_VERTICES, HAIR_INDICES,
                                           tessellation_rate=16))
    cs = scene.commit()
    return dict(cscene=cs, gid_curve=gid_curve, gid_plane=gid_plane)


def _curve_color(u, prim):
    """Interpolate control-point colors with the same B-spline basis the
    curve itself uses (the vertex-attribute interpolation of the demo)."""
    t = jnp.clip(u, 0.0, 1.0)
    i = jnp.clip(prim, 0, 5)
    c = jnp.asarray(HAIR_COLORS)
    t2, t3 = t * t, t * t * t
    n0 = (1 - 3 * t + 3 * t2 - t3) / 6.0
    n1 = (4 - 6 * t2 + 3 * t3) / 6.0
    n2 = (1 + 3 * t + 3 * t2 - 3 * t3) / 6.0
    n3 = t3 / 6.0
    return (n0[..., None] * c[i] + n1[..., None] * c[i + 1]
            + n2[..., None] * c[i + 2] + n3[..., None] * c[i + 3])


@functools.partial(jax.jit, static_argnames=("width", "height",
                                             "gid_curve"))
def render(cscene, cam_vx, cam_vy, cam_vz, cam_p,
           *, width: int, height: int, gid_curve: int):
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    x, y = jnp.meshgrid(xs, ys)
    d = normalize(x[..., None] * cam_vx + y[..., None] * cam_vy + cam_vz)
    org = jnp.broadcast_to(cam_p, d.shape)
    rays = Rays(org, d, jnp.zeros(d.shape[:-1], jnp.float32),
                jnp.full(d.shape[:-1], jnp.inf, jnp.float32))
    hits = scene_intersect(cscene, rays, coherent=True)
    curve_col = _curve_color(hits.u, hits.prim_id)
    col = jnp.where((hits.geom_id == gid_curve)[..., None], curve_col,
                    jnp.asarray([0.7, 0.7, 0.7], jnp.float32))
    ns = normalize(hits.ng)
    ns = jnp.where(dot(d, ns)[..., None] < 0, ns, -ns)
    shade = 0.2 + 0.8 * jnp.clip(dot(-d, ns), 0.0, 1.0)
    return jnp.where(hits.valid[..., None], col * shade[..., None], 0.0)


def render_frame(state, camera: Camera, size):
    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    img = render(state["cscene"], vx, vy, vz, p, width=w, height=h,
                 gid_curve=state["gid_curve"])
    return img, w * h


def make_app() -> TutorialApplication:
    app = TutorialApplication("curve_geometry", build_scene, render_frame)
    app.camera = Camera(from_=(2, 2.5, -6), to=(0, 0, 0))
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
