"""hair_geometry tutorial: fur patch of Bezier hair strands on a plane.

Analog of tutorials/hair_geometry: random hair strands rooted on a ground
patch, rendered with diffuse + shadow shading (curve accel from
scene/curves.py)."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.device import Device
from ...core.math import dot, normalize
from ...core.rayhit import Rays
from ...scene.curves import BezierCurves
from ...scene.geometry import TriangleMesh
from ...scene.scene import Scene, scene_intersect, scene_occluded
from ..camera import Camera
from ..tutorial_app import TutorialApplication


def make_fur(n_strands=120, seed=7):
    rng = np.random.default_rng(seed)
    roots = rng.uniform(-1, 1, (n_strands, 2)).astype(np.float32)
    cps = []
    idx = []
    for i, (x, z) in enumerate(roots):
        sway = rng.normal(0, 0.15, 2)
        r0 = 0.02
        cps.extend([
            [x, 0.0, z, r0],
            [x + sway[0] * 0.3, 0.35, z + sway[1] * 0.3, r0 * 0.7],
            [x + sway[0] * 0.8, 0.7, z + sway[1] * 0.8, r0 * 0.4],
            [x + sway[0], 1.0, z + sway[1], r0 * 0.15]])
        idx.append(4 * i)
    return (np.asarray(cps, np.float32), np.asarray(idx, np.int32))


def build_scene(n_strands=120):
    dev = Device("ignore_config_files=1")
    scene = Scene(dev)
    pv = np.array([[-2, 0, -2], [-2, 0, 2], [2, 0, -2], [2, 0, 2]], np.float32)
    pi = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    scene.attach(TriangleMesh(pv, pi))                      # geom 0 ground
    cps, idx = make_fur(n_strands)
    scene.attach(BezierCurves(cps, idx, tessellation_rate=6))  # geom 1 hair
    cs = scene.commit()
    return dict(cscene=cs, scene=scene)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render(cscene, cam_vx, cam_vy, cam_vz, cam_p, *, width, height):
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    x, y = jnp.meshgrid(xs, ys)
    d = normalize(x[..., None] * cam_vx + y[..., None] * cam_vy + cam_vz)
    org = jnp.broadcast_to(cam_p, d.shape)
    rays = Rays(org, d, jnp.zeros(d.shape[:-1], jnp.float32),
                jnp.full(d.shape[:-1], jnp.inf, jnp.float32))
    hits = scene_intersect(cscene, rays, coherent=True)
    valid = hits.valid
    diffuse = jnp.where((hits.geom_id == 1)[..., None],
                        jnp.asarray([0.65, 0.45, 0.2]),   # hair
                        jnp.asarray([0.3, 0.5, 0.3]))     # ground
    color = jnp.where(valid[..., None], 0.4 * diffuse, 0.0)
    light_dir = normalize(jnp.asarray([-1.0, -2.0, -1.0]))
    hit_p = org + hits.t[..., None] * d
    occ = scene_occluded(cscene, Rays(
        hit_p, jnp.broadcast_to(-light_dir, d.shape),
        jnp.full(d.shape[:-1], 1e-3, jnp.float32),
        jnp.full(d.shape[:-1], jnp.inf, jnp.float32)))
    ng = normalize(hits.ng)
    ng = jnp.where(dot(d, ng)[..., None] < 0, ng, -ng)
    ndotl = jnp.clip(-dot(jnp.broadcast_to(light_dir, d.shape), ng), 0.0, 1.0)
    color = color + jnp.where((valid & ~occ)[..., None],
                              diffuse * ndotl[..., None], 0.0)
    return color


def render_frame(state, camera, size):
    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    return render(state["cscene"], vx, vy, vz, p, width=w, height=h), 2 * w * h


def make_app() -> TutorialApplication:
    app = TutorialApplication("hair_geometry", lambda a: build_scene(),
                              render_frame, default_size=(256, 256))
    app.camera = Camera(from_=(2.5, 2.0, 2.5), to=(0, 0.4, 0), fov=50)
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
