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
from ..camera import Camera, pixel_coords
from ..materials import make_material_table
from ..objloader import load_obj
from ..texture import make_texture_set, sample_texture
from ..tutorial_app import TutorialApplication


def build_scene(obj_path: str, subdiv_mode=None, subdiv_level=5,
                comp_level=2):
    cfg = "ignore_config_files=1"
    if subdiv_mode:
        cfg += f",subdiv_accel={subdiv_mode}"
    dev = Device(cfg)
    scene = Scene(dev)
    if obj_path.lower().endswith(".xml"):
        from ..xmlloader import load_xml
        xs = load_xml(obj_path)
        geometries, mats = xs.geometries, xs.materials
    elif obj_path.lower().endswith(".scn"):
        from ..coronaloader import load_corona
        xs = load_corona(obj_path)
        geometries, mats = xs.geometries, xs.materials
    elif obj_path.lower().endswith(".ply"):
        from ..plyloader import load_ply
        from ..materials import MAT_OBJ
        geometries = [(load_ply(obj_path), 0)]
        mats = [{"type": MAT_OBJ, "kd": (0.5, 0.5, 0.5)}]
    else:
        geometries, mats = load_obj(obj_path,
                                    subdiv_mode=subdiv_mode is not None)
    geom_mat = []
    uv_per_geom = {}
    prim_base = {}
    uv_all = []
    for geom, m in geometries:
        gid = scene.attach(geom)
        while len(geom_mat) <= gid:
            geom_mat.append(0)
        geom_mat[gid] = m
        tc = getattr(geom, "texcoords", None)
        prim_base[gid] = len(uv_all)
        if tc is not None:
            uv_all.extend(tc)
        elif hasattr(geom, "indices"):
            uv_all.extend(np.zeros((geom.num_prims, 3, 2), np.float32))
    scene.set_levels(subdiv_level, comp_level)
    cs = scene.commit()

    # material textures (map_Kd)
    images = []
    kd_tex = np.full(len(mats), -1, np.int32)
    for i, m in enumerate(mats):
        if "map_kd" in m:
            kd_tex[i] = len(images)
            images.append(m["map_kd"])
    base_arr = np.zeros(max(len(geom_mat), 1), np.int32)
    for gid, b in prim_base.items():
        base_arr[gid] = b
    return dict(cscene=cs, scene=scene,
                materials=make_material_table(mats),
                geom_mat=jnp.asarray(np.asarray(geom_mat, np.int32)),
                textures=make_texture_set(images),
                kd_tex=jnp.asarray(kd_tex),
                tri_uv=jnp.asarray(np.asarray(uv_all, np.float32)
                                   if uv_all else np.zeros((1, 3, 2),
                                                           np.float32)),
                prim_base=jnp.asarray(base_arr))


@functools.partial(jax.jit, static_argnames=("width", "height"))
def _trace(cscene, materials, geom_mat, textures, kd_tex, tri_uv, prim_base,
           cam_vx, cam_vy, cam_vz, cam_p, perm=None, inv=None,
           *, width: int, height: int):
    """Jitted trace + material part; returns flat (in image-row order)
    kd/valid/d/geom/prim/u/v/ng so the smooth-normal pass can run on top."""
    x, y = pixel_coords(width, height, perm)
    d = normalize(x[..., None] * cam_vx + y[..., None] * cam_vy + cam_vz)
    org = jnp.broadcast_to(cam_p, d.shape)
    rays = Rays(org, d, jnp.zeros(d.shape[:-1], jnp.float32),
                jnp.full(d.shape[:-1], jnp.inf, jnp.float32))
    hits = scene_intersect(cscene, rays, coherent=True)
    valid = hits.valid

    mid = geom_mat[jnp.clip(hits.geom_id, 0, geom_mat.shape[0] - 1)]
    kd = materials.kd[mid]
    # map_Kd texture lookup with barycentric-interpolated texcoords
    tid = kd_tex[mid]
    gp = jnp.clip(prim_base[jnp.clip(hits.geom_id, 0, prim_base.shape[0] - 1)]
                  + hits.prim_id, 0, tri_uv.shape[0] - 1)
    uv3 = tri_uv[gp]  # (..., 3, 2)
    w0 = (1.0 - hits.u - hits.v)[..., None]
    uv = uv3[..., 0, :] * w0 + uv3[..., 1, :] * hits.u[..., None] \
        + uv3[..., 2, :] * hits.v[..., None]
    tex = sample_texture(textures, jnp.maximum(tid, 0), uv[..., 0], uv[..., 1])
    kd = jnp.where((tid >= 0)[..., None], kd * tex, kd)
    out = (kd, valid, d, hits.geom_id, hits.prim_id, hits.u, hits.v, hits.ng)
    if inv is not None:
        # legacy per-array unsort (8 1M-row gathers); the frame path now
        # shades in morton order and unsorts ONE rgb image at the end
        out = tuple(a[inv] for a in out)
    return out


def render(cscene, materials, geom_mat, textures, kd_tex, tri_uv, prim_base,
           cam_vx, cam_vy, cam_vz, cam_p, perm=None, inv=None,
           *, width: int, height: int):
    """One-shot geometric-normal render (no smooth-normal pass) — the
    fast path used by viewer_anim's per-frame loop."""
    kd, valid, d, _gid, _prim, _u, _v, ng = _trace(
        cscene, materials, geom_mat, textures, kd_tex, tri_uv, prim_base,
        cam_vx, cam_vy, cam_vz, cam_p, perm, None,
        width=width, height=height)
    img = _shade(kd, valid, d, ng)
    if perm is not None and inv is not None:
        img = img[inv]
    return img.reshape(height, width, 3)


def _shade(kd, valid, d, ns):
    """color = Kd * dot(-dir, face_forward(normalize(Ns))) —
    viewer_device.cpp:241-244,304. Returns flat (R, 3)."""
    ns = normalize(ns)
    ns = jnp.where(dot(d, ns)[..., None] < 0, ns, -ns)
    shade = jnp.clip(dot(-d, ns), 0.0, 1.0)
    return jnp.where(valid[..., None], kd * shade[..., None], 0.0)


def render_frame(state, camera: Camera, size, smooth_normals: bool = True):
    """Reference viewer shading: g_use_smooth_normals defaults TRUE in
    the fork (viewer_device.cpp:132) — Ns = cross(dPdv, dPdu) from
    rtcInterpolate at every hit (:284-295), which for subdiv geometry is
    the analytic limit-surface normal (essential for compressed leaves,
    whose raw Ng is the dummy (1,0,0)).

    The whole frame runs in MORTON RAY ORDER; only the final rgb image
    is unsorted (one (R,3) gather instead of eight 1M-row per-hit-field
    gathers — the unsort was ~15% of the bomberman frame). Smooth
    normals ride the fused normal table (Scene.interpolate_normal:
    4 corner gathers, down from interpolate()'s 16)."""
    from ..camera import pixel_morton_order_device
    from ...scene.geometry import SubdivMesh
    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    perm, inv = pixel_morton_order_device(w, h)
    kd, valid, d, gid, prim, u, v, ng = _trace(
        state["cscene"], state["materials"], state["geom_mat"],
        state["textures"], state["kd_tex"], state["tri_uv"],
        state["prim_base"], vx, vy, vz, p, perm, None, width=w, height=h)
    scene = state.get("scene")
    if smooth_normals and scene is not None:
        for g_id, g in scene.geometries.items():
            if not isinstance(g, SubdivMesh):
                continue    # triangle dPdu/dPdv cross == +-Ng already
            m = valid & (gid == g_id)
            nrm = scene.interpolate_normal(g_id, jnp.maximum(prim, 0),
                                           u, v)
            ng = jnp.where(m[..., None], nrm, ng)
    img = _shade(kd, valid, d, ng)[inv].reshape(h, w, 3)
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
