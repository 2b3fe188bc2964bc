"""subdivision_geometry tutorial: creased Catmull-Clark cube + plane.

Recreates tutorials/subdivision_geometry/subdivision_geometry_device.cpp:
ground plane (geom 0, diffuse (0.8,0,0)) + 6-quad subdiv cube (geom 1,
diffuse (0.9,0.6,0.5)) with edge/vertex crease weights (the reference
animates them over time; `crease_weight` selects the static frame — the
stored arrays use inf, :58-74). Shading identical to displacement_geometry.
"""
from __future__ import annotations

import numpy as np

from ...core.device import Device
from ...scene.geometry import SubdivMesh, TriangleMesh
from ...scene.scene import Scene
from ..camera import Camera
from ..tutorial_app import TutorialApplication
from .displacement_geometry import (CUBE_FACES, CUBE_INDICES, CUBE_VERTICES,
                                    PLANE_INDICES, PLANE_VERTICES)
from .displacement_geometry import render_frame as _render_frame_raw

EDGE_CREASE_INDICES = np.array([
    [0, 1], [1, 2], [2, 3], [3, 0],
    [4, 5], [5, 6], [6, 7], [7, 4],
    [0, 4], [1, 5], [2, 6], [3, 7]], np.int32)


def build_scene(subdiv_mode=None, subdiv_level=4, comp_level=2,
                crease_weight=None):
    """crease_weight=None is reference-exact: the tutorial binds its
    edge/vertex crease arrays with itemCount ZERO
    (subdivision_geometry_device.cpp:130-134 — last
    rtcSetSharedGeometryBuffer arg), so NO creases are active and the
    cube subdivides to the smooth rounded limit surface (confirmed
    against the reference binary's own render). Pass a weight to get
    the creased variant the arrays were presumably meant to enable."""
    cfg = "ignore_config_files=1"
    if subdiv_mode:
        cfg += f",subdiv_accel={subdiv_mode}"
    dev = Device(cfg)
    scene = Scene(dev)
    scene.attach(TriangleMesh(PLANE_VERTICES, PLANE_INDICES))  # geom 0
    if crease_weight is None:
        scene.attach(SubdivMesh(CUBE_VERTICES, CUBE_FACES, CUBE_INDICES))
    else:
        w = min(crease_weight, 1e9)
        scene.attach(SubdivMesh(
            CUBE_VERTICES, CUBE_FACES, CUBE_INDICES,
            edge_creases=EDGE_CREASE_INDICES,
            edge_crease_weights=np.full(12, w, np.float32),
            vertex_creases=np.arange(8, dtype=np.int32),
            vertex_crease_weights=np.full(8, w, np.float32)))  # geom 1
    scene.set_levels(subdiv_level, comp_level)
    cs = scene.commit()
    return dict(cscene=cs, scene=scene)


def render_frame(state, camera: Camera, size, smooth_normals: bool = True):
    """Reference-exact shading: the subdiv cube (geomID > 0) shades with
    the SMOOTH limit-surface normal Ng = cross(dPdu, dPdv) from
    rtcInterpolate (subdivision_geometry_device.cpp:219-226); the plane
    keeps its raw triangle normal."""
    if not smooth_normals:
        return _render_frame_raw(state, camera, size)
    import jax.numpy as jnp

    from ...core.math import normalize as _norm
    from ..camera import pixel_morton_order_device
    from .displacement_geometry import _shade, trace

    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    perm, inv = pixel_morton_order_device(w, h)
    valid, occ, gid, prim, u, v, ng, d = trace(
        state["cscene"], vx, vy, vz, p, perm, inv, width=w, height=h)
    scene = state["scene"]
    ns = np.array(_norm(ng))
    gid_np = np.asarray(gid)
    valid_np = np.asarray(valid)
    for g_id, g in scene.geometries.items():
        if not isinstance(g, SubdivMesh):
            continue
        m = (gid_np == g_id) & valid_np
        if not m.any():
            continue
        dv = scene.interpolate(g_id, np.asarray(prim)[m],
                               np.asarray(u)[m], np.asarray(v)[m],
                               derivatives=True)
        sm = np.asarray(jnp.cross(dv["dPdu"], dv["dPdv"]))
        ns[m] = np.asarray(_norm(jnp.asarray(sm)))
    img = _shade(valid, occ, gid, jnp.asarray(ns), d, w, h)
    return img, 2 * w * h


def make_app() -> TutorialApplication:
    def _build(app):
        args = getattr(app, "args", None)
        mode = getattr(args, "subdiv_mode", None) if args else None
        lvl = getattr(args, "subdLvl", 4) if args else 4
        cl = getattr(args, "compLvl", 2) if args else 2
        return build_scene(mode, lvl, cl)

    app = TutorialApplication("subdivision_geometry", _build, render_frame)
    app.camera = Camera(from_=(2.5, 2.5, 2.5), to=(0, 0, 0))
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
