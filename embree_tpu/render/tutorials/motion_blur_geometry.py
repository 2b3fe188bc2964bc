"""motion_blur_geometry tutorial: animated cubes, per-pixel time sampling.

Recreates tutorials/motion_blur_geometry/motion_blur_geometry_device.cpp:
a row of cubes each with multi-timestep vertex animation (addTriangleCube
:98-135 — rotation+scale per timestep; addQuadCube; a linearly translating
sphere), sampled with one random ray time per pixel per frame and averaged
into an accumulation buffer (renderPixelStandard :520-560, g_accu
:590-620).  Our MB geometry is 2-timestep linear (traverse/mb.py), so the
reference's rotation is endpoint-sampled — the same thing the reference
does per timestep pair.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.device import Device
from ...core.math import dot, normalize
from ...core.rayhit import Rays
from ...scene.geometry import TriangleMesh, TriangleMeshMB
from ...scene.scene import Scene, scene_intersect
from ..camera import Camera
from ..tutorial_app import TutorialApplication

CUBE_V = np.asarray([
    [-1, -1, -1], [1, -1, -1], [1, -1, 1], [-1, -1, 1],
    [-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]], np.float32)
CUBE_T = np.asarray([
    [1, 4, 5], [0, 4, 1], [2, 5, 6], [1, 5, 2], [3, 6, 7], [2, 6, 3],
    [4, 3, 7], [0, 3, 4], [5, 7, 6], [4, 7, 5], [3, 1, 2], [0, 1, 3]],
    np.int32)
CUBE_Q = np.asarray([
    [0, 4, 5, 1], [1, 5, 6, 2], [2, 6, 7, 3],
    [0, 3, 7, 4], [4, 7, 6, 5], [0, 1, 2, 3]], np.int32)


def _rot_y(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _cube_verts(pos, angle):
    scale = np.diag([2.0, 1.0, 1.0]).astype(np.float32)
    return (CUBE_V @ ((_rot_y(angle) @ scale).T) + np.asarray(pos,
                                                              np.float32))


def _quads_to_tris(q):
    return np.concatenate([q[:, [0, 1, 3]], q[:, [1, 2, 3]]]).astype(np.int32)


def _sphere(pos, r, n=16):
    phi = np.linspace(0, np.pi, n + 1)
    theta = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    P, T = np.meshgrid(phi, theta, indexing="ij")
    v = np.stack([pos[0] + r * np.sin(P) * np.sin(T),
                  pos[1] + r * np.cos(P),
                  pos[2] + r * np.sin(P) * np.cos(T)], -1)
    v = v.reshape(-1, 3).astype(np.float32)
    tris = []
    for i in range(n):
        for j in range(2 * n):
            jn = (j + 1) % (2 * n)
            a, b = i * 2 * n + j, i * 2 * n + jn
            c, d = (i + 1) * 2 * n + j, (i + 1) * 2 * n + jn
            if i > 0:
                tris.append((a, b, c))
            if i < n - 1:
                tris.append((b, d, c))
    return v, np.asarray(tris, np.int32)


def build_scene(app=None):
    dev = Device("ignore_config_files=1")
    scene = Scene(dev)
    # rotating triangle cube (timestep pair = endpoints of a quarter turn)
    scene.attach(TriangleMeshMB(_cube_verts((-5, 1, 0), 0.0),
                                _cube_verts((-5, 1, 0), 0.5 * np.pi),
                                CUBE_T))
    # rotating quad cube (converted to tris like our quad flattening)
    qt = _quads_to_tris(CUBE_Q)
    scene.attach(TriangleMeshMB(_cube_verts((0, 1, 0), 0.0),
                                _cube_verts((0, 1, 0), 0.5 * np.pi), qt))
    # linearly translating sphere (the reference's moving instances)
    sv, st = _sphere((5, 1, 0), 1.0)
    scene.attach(TriangleMeshMB(sv, sv + np.asarray([0, 2, 0], np.float32),
                                st))
    # static ground plane
    gv = np.asarray([[-15, 0, -15], [15, 0, -15], [15, 0, 15],
                     [-15, 0, 15]], np.float32)
    scene.attach(TriangleMesh(gv, np.asarray([[0, 1, 2], [0, 2, 3]],
                                             np.int32)))
    cs = scene.commit()
    return dict(cscene=cs, accu=None, frame=0)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render(cscene, key, cam_vx, cam_vy, cam_vz, cam_p,
           *, width: int, height: int):
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    x, y = jnp.meshgrid(xs, ys)
    d = normalize(x[..., None] * cam_vx + y[..., None] * cam_vy + cam_vz)
    org = jnp.broadcast_to(cam_p, d.shape)
    rays = Rays(org, d, jnp.zeros(d.shape[:-1], jnp.float32),
                jnp.full(d.shape[:-1], jnp.inf, jnp.float32))
    time = jax.random.uniform(key, d.shape[:-1])  # one time sample / pixel
    hits = scene_intersect(cscene, rays, time=time)
    ns = normalize(hits.ng)
    ns = jnp.where(dot(d, ns)[..., None] < 0, ns, -ns)
    shade = 0.2 + 0.8 * jnp.clip(dot(-d, ns), 0.0, 1.0)
    cols = jnp.asarray([[1.0, 0.3, 0.3], [0.3, 1.0, 0.3], [0.3, 0.3, 1.0],
                        [0.8, 0.8, 0.8]], jnp.float32)
    col = cols[jnp.clip(hits.geom_id, 0, 3)]
    return jnp.where(hits.valid[..., None], col * shade[..., None], 0.0)


def render_frame(state, camera: Camera, size):
    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    key = jax.random.PRNGKey(state["frame"])
    img = render(state["cscene"], key, vx, vy, vz, p, width=w, height=h)
    # accumulation buffer (g_accu)
    if state["accu"] is None or state["accu"].shape != img.shape:
        state["accu"] = img
        state["frame"] = 1
    else:
        n = state["frame"]
        state["accu"] = (state["accu"] * n + img) / (n + 1)
        state["frame"] = n + 1
    return state["accu"], w * h


def make_app() -> TutorialApplication:
    app = TutorialApplication("motion_blur_geometry", build_scene,
                              render_frame)
    app.camera = Camera(from_=(0, 8, -14), to=(0, 1, 0))
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
