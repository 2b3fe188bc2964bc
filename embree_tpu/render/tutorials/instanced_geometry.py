"""instanced_geometry tutorial: one sphere scene instanced 4x.

Recreates tutorials/instanced_geometry/instanced_geometry_device.cpp:
a child scene with a triangulated sphere, four RTC_GEOMETRY_TYPE_INSTANCE
placements orbiting the origin (instance_xfm updates, :195-215), a
ground plane in the top scene, instance-id-based coloring
(g_instance_colors, :230-260) with eyelight shading.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.device import Device
from ...core.math import dot, normalize
from ...core.rayhit import Rays
from ...scene.geometry import Instance, TriangleMesh
from ...scene.scene import Scene, scene_intersect
from ..camera import Camera
from ..tutorial_app import TutorialApplication
from .dynamic_scene import _sphere


def _orbit_xfm(k: int, time: float) -> np.ndarray:
    a = time + k * np.pi / 2
    t = np.zeros((3, 4), np.float32)
    t[:, :3] = np.eye(3)
    t[:, 3] = (2.5 * np.cos(a), 0.0, 2.5 * np.sin(a))
    return t


def build_scene(time: float = 0.0):
    dev = Device("ignore_config_files=1")
    child = Scene(dev)
    v, tris = _sphere((0.0, 0.0, 0.0), 1.0, 0.0, 0.0)
    child.attach(TriangleMesh(v, tris))
    child.commit()

    scene = Scene(dev)
    for k in range(4):
        scene.attach(Instance(child, _orbit_xfm(k, time)))
    gv = np.asarray([[-10, -2, -10], [10, -2, -10], [10, -2, 10],
                     [-10, -2, 10]], np.float32)
    scene.attach(TriangleMesh(gv, np.asarray([[0, 1, 2], [0, 2, 3]],
                                             np.int32)))
    cs = scene.commit()
    colors = np.asarray([[0.85, 0.0, 0.0], [0.0, 0.85, 0.0],
                         [0.0, 0.0, 0.85], [0.85, 0.85, 0.0],
                         [0.7, 0.7, 0.7]], np.float32)
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
    # color by instance id (instanced_geometry_device.cpp:246); the
    # ground hits carry inst_id == -1 -> last color
    cidx = jnp.where(hits.inst_id >= 0, jnp.clip(hits.inst_id, 0, 3), 4)
    col = colors[cidx]
    ns = normalize(hits.ng)
    ns = jnp.where(dot(d, ns)[..., None] < 0, ns, -ns)
    shade = jnp.clip(dot(-d, ns), 0.0, 1.0)
    return jnp.where(hits.valid[..., None], col * shade[..., None], 0.0)


def render_frame(state, camera: Camera, size):
    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    img = render(state["cscene"], state["colors"], vx, vy, vz, p,
                 width=w, height=h)
    return img, w * h


def make_app() -> TutorialApplication:
    app = TutorialApplication("instanced_geometry",
                              lambda app: build_scene(), render_frame)
    app.camera = Camera(from_=(0, 5, -8), to=(0, 0, 0))
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
