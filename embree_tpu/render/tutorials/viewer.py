"""viewer tutorial: OBJ scene renderer (eyelight shading).

Recreates tutorials/viewer/viewer_device.cpp renderPixelStandard
(:249-305): primary rays, OBJ material Kd, color = Kd * dot(-dir, Ns),
black background; `--subdiv` converts OBJ faces to Catmull-Clark
subdivision surfaces with the fork's compressed accel modes
(obj_loader.cpp:528, tutorial.cpp:1104), smooth normals optional.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.device import Device
from ...core.math import dot, normalize
from ...core.rayhit import Rays
from ...scene.scene import Scene, scene_intersect
from ..camera import Camera
from ..materials import make_material_table
from ..objloader import load_obj
from ..tutorial_app import TutorialApplication


def build_scene(obj_path: str, subdiv_mode=None, subdiv_level=5,
                comp_level=2):
    cfg = "ignore_config_files=1"
    if subdiv_mode:
        cfg += f",subdiv_accel={subdiv_mode}"
    dev = Device(cfg)
    scene = Scene(dev)
    geometries, mats = load_obj(obj_path, subdiv_mode=subdiv_mode is not None)
    geom_mat = []
    for geom, m in geometries:
        gid = scene.attach(geom)
        while len(geom_mat) <= gid:
            geom_mat.append(0)
        geom_mat[gid] = m
    scene.set_levels(subdiv_level, comp_level)
    cs = scene.commit()
    return dict(cscene=cs, scene=scene,
                materials=make_material_table(mats),
                geom_mat=jnp.asarray(np.asarray(geom_mat, np.int32)))


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render(cscene, materials, geom_mat, cam_vx, cam_vy, cam_vz, cam_p,
           *, width: int, height: int):
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    x, y = jnp.meshgrid(xs, ys)
    d = normalize(x[..., None] * cam_vx + y[..., None] * cam_vy + cam_vz)
    org = jnp.broadcast_to(cam_p, d.shape)
    rays = Rays(org, d, jnp.zeros(d.shape[:-1], jnp.float32),
                jnp.full(d.shape[:-1], jnp.inf, jnp.float32))
    hits = scene_intersect(cscene, rays)
    valid = hits.valid

    mid = geom_mat[jnp.clip(hits.geom_id, 0, geom_mat.shape[0] - 1)]
    kd = materials.kd[mid]
    ns = normalize(hits.ng)
    # face forward (viewer_device.cpp:241-244)
    ns = jnp.where(dot(d, ns)[..., None] < 0, ns, -ns)
    shade = jnp.clip(dot(-d, ns), 0.0, 1.0)
    return jnp.where(valid[..., None], kd * shade[..., None], 0.0)


def render_frame(state, camera: Camera, size):
    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    img = render(state["cscene"], state["materials"], state["geom_mat"],
                 vx, vy, vz, p, width=w, height=h)
    return img, w * h


def make_app() -> TutorialApplication:
    import argparse

    def _build(app):
        obj = getattr(app.args, "input", None)
        if obj is None:
            raise SystemExit("viewer: -i <scene.obj> required")
        return build_scene(obj, getattr(app.args, "subdiv_mode", None),
                           app.args.subdLvl, app.args.compLvl)

    app = TutorialApplication("viewer", _build, render_frame)
    parser_make = app.make_parser

    def make_parser():
        p = parser_make()
        p.add_argument("-i", "--input", type=str, default=None)
        return p

    app.make_parser = make_parser
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
