"""dynamic_scene tutorial: animated spheres, per-frame rebuild/refit.

Recreates tutorials/dynamic_scene/dynamic_scene_device.cpp: N triangulated
spheres whose vertices are re-generated each frame (animateSphere,
:165-215 — y displaced by a per-sphere phase), committed again every
frame (REFIT for even ids, full rebuild for odd ids — the reference
alternates build quality per sphere at :320-330), then eyelight-shaded
with per-sphere colors (:219-249).
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
from ...scene.scene import BuildQuality, Scene, scene_intersect
from ..camera import Camera
from ..tutorial_app import TutorialApplication

NUM_SPHERES = 8
NUM_PHI = 8
NUM_THETA = 16


def _sphere(pos, r, phase, time):
    """Triangulated sphere with the animated y-wobble."""
    phi = np.linspace(0, np.pi, NUM_PHI + 1)
    theta = np.linspace(0, 2 * np.pi, NUM_THETA, endpoint=False)
    P, T = np.meshgrid(phi, theta, indexing="ij")
    x = pos[0] + r * np.sin(P) * np.sin(T)
    y = pos[1] + r * np.cos(P) + 0.5 * r * np.sin(phase + time)
    z = pos[2] + r * np.sin(P) * np.cos(T)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    tris = []
    for i in range(NUM_PHI):
        for j in range(NUM_THETA):
            jn = (j + 1) % NUM_THETA
            a = i * NUM_THETA + j
            b = i * NUM_THETA + jn
            c = (i + 1) * NUM_THETA + j
            d = (i + 1) * NUM_THETA + jn
            if i > 0:
                tris.append((a, b, c))
            if i < NUM_PHI - 1:
                tris.append((b, d, c))
    return verts, np.asarray(tris, np.int32)


def build_scene(time: float = 0.0):
    rng = np.random.default_rng(42)
    dev = Device("ignore_config_files=1")
    scene = Scene(dev)
    colors = [np.array([1, 1, 1], np.float32)]
    pos = rng.uniform(-2, 2, (NUM_SPHERES, 3)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, NUM_SPHERES).astype(np.float32)
    for i in range(NUM_SPHERES):
        v, t = _sphere(pos[i], 0.5, phase[i], time)
        scene.attach(TriangleMesh(v, t))
        colors.append(rng.uniform(0.2, 1.0, 3).astype(np.float32))
    # ground plane
    gv = np.asarray([[-10, -3, -10], [10, -3, -10], [10, -3, 10],
                     [-10, -3, 10]], np.float32)
    gt = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    scene.attach(TriangleMesh(gv, gt))
    cs = scene.commit()
    return dict(cscene=cs, scene=scene, pos=pos, phase=phase,
                colors=jnp.asarray(np.stack(colors[1:] + [colors[0]])))


def animate(state, time: float):
    """Per-frame vertex update + recommit (the reference's per-frame
    rtcCommitScene; even spheres refit-quality, odd rebuild)."""
    scene = state["scene"]
    for i in range(NUM_SPHERES):
        v, t = _sphere(state["pos"][i], 0.5, state["phase"][i], time)
        g = scene.geometries[i]
        g.vertices = v
        scene.quality = BuildQuality.REFIT if i % 2 == 0 \
            else BuildQuality.MEDIUM
    state["cscene"] = scene.commit()
    return state


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
    col = colors[jnp.clip(hits.geom_id, 0, colors.shape[0] - 1)]
    ns = normalize(hits.ng)
    ns = jnp.where(dot(d, ns)[..., None] < 0, ns, -ns)
    shade = jnp.clip(dot(-d, ns), 0.0, 1.0)
    return jnp.where(hits.valid[..., None], col * shade[..., None], 0.0)


_frame = [0]


def render_frame(state, camera: Camera, size):
    w, h = size
    t = 0.2 * _frame[0]
    _frame[0] += 1
    if _frame[0] > 1:
        state = animate(state, t)
    vx, vy, vz, p = camera.ispc_camera(w, h)
    img = render(state["cscene"], state["colors"], vx, vy, vz, p,
                 width=w, height=h)
    return img, w * h


def make_app() -> TutorialApplication:
    app = TutorialApplication("dynamic_scene", lambda app: build_scene(),
                              render_frame)
    app.camera = Camera(from_=(0, 4, -7), to=(0, -1, 0))
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
