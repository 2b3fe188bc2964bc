"""displacement_geometry tutorial: displaced subdiv cube + ground plane.

Recreates tutorials/displacement_geometry/displacement_geometry_device.cpp:
ground plane (geom 0, diffuse (0.8,0,0)) + 6-quad subdiv cube (geom 1,
diffuse (0.9,0.6,0.5)) with procedural fBm noise displacement along the
geometric normal (:88-125), SUBDIVISION_LEVEL=6 / COMPRESSED_LEVELS=4 via
rtcSetSceneLevels (:144, our Scene.set_levels), shading identical to the
triangle tutorial (0.5*diffuse ambient + n.l with shadow ray). The
compressed accel mode is selected by the --compress.* CLI flags
(subdiv_accel config).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.device import Device
from ...core.math import dot, normalize
from ...core.rayhit import Rays
from ...scene.geometry import SubdivMesh, TriangleMesh
from ...scene.scene import CommittedScene, Scene, scene_intersect, scene_occluded
from ..camera import Camera, pixel_coords
from ..noise import fbm_displacement
from ..tutorial_app import TutorialApplication

SUBDIVISION_LEVEL = 6
COMPRESSED_LEVELS = 4

CUBE_VERTICES = np.array([
    [-1, -1, -1], [1, -1, -1], [1, -1, 1], [-1, -1, 1],
    [-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]], np.float32)
CUBE_INDICES = np.array([
    0, 4, 5, 1,
    1, 5, 6, 2,
    2, 6, 7, 3,
    0, 3, 7, 4,
    4, 7, 6, 5,
    0, 1, 2, 3], np.int32)
CUBE_FACES = np.full(6, 4, np.int32)

PLANE_VERTICES = np.array([
    [-10, -2, -10], [-10, -2, 10], [10, -2, -10], [10, -2, 10]], np.float32)
PLANE_INDICES = np.array([[0, 1, 2], [1, 3, 2]], np.int32)


def displacement(p, ng, u, v):
    """displacementFunction (:111-125): P += displacement(P) * Ng."""
    dn = fbm_displacement(np.asarray(p, np.float32))
    return np.asarray(p) + dn[..., None] * np.asarray(ng)


def build_scene(subdiv_mode=None, subdiv_level=SUBDIVISION_LEVEL,
                comp_level=COMPRESSED_LEVELS):
    cfg = "ignore_config_files=1"
    if subdiv_mode:
        cfg += f",subdiv_accel={subdiv_mode}"
    dev = Device(cfg)
    scene = Scene(dev)
    scene.attach(TriangleMesh(PLANE_VERTICES, PLANE_INDICES))  # geom 0
    scene.attach(SubdivMesh(CUBE_VERTICES, CUBE_FACES, CUBE_INDICES,
                            displacement=displacement))        # geom 1
    scene.set_levels(subdiv_level, comp_level)
    cs = scene.commit()
    return dict(cscene=cs, scene=scene)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def trace(cscene: CommittedScene, cam_vx, cam_vy, cam_vz, cam_p,
          perm=None, inv=None, *, width: int, height: int):
    """Primary + shadow trace; returns flat image-row-ordered hit fields
    so shading variants (raw Ng here; smooth limit normals in
    subdivision_geometry) share one traced program."""
    x, y = pixel_coords(width, height, perm)
    d = normalize(x[..., None] * cam_vx + y[..., None] * cam_vy + cam_vz)
    org = jnp.broadcast_to(cam_p, d.shape)
    rays = Rays(org, d, jnp.zeros(d.shape[:-1], jnp.float32),
                jnp.full(d.shape[:-1], jnp.inf, jnp.float32))
    hits = scene_intersect(cscene, rays, coherent=True)

    light_dir = normalize(jnp.asarray([-1.0, -1.0, -1.0]))
    hit_p = org + hits.t[..., None] * d
    shadow = Rays(hit_p, jnp.broadcast_to(-light_dir, d.shape),
                  jnp.full(d.shape[:-1], 1e-3, jnp.float32),
                  jnp.full(d.shape[:-1], jnp.inf, jnp.float32))
    occ = scene_occluded(cscene, shadow, coherent=True)
    out = (hits.valid, occ, hits.geom_id, hits.prim_id, hits.u, hits.v,
           hits.ng, d)
    if inv is not None:
        out = tuple(a[inv] for a in out)
    return out


def _shade(valid, occ, geom_id, ng, d, width, height):
    """0.5*diffuse ambient + shadowed n.l — the shading shared by the
    subdivision/displacement tutorials (:226-240)."""
    diffuse = jnp.where((geom_id != 0)[..., None],
                        jnp.asarray([0.9, 0.6, 0.5]),
                        jnp.asarray([0.8, 0.0, 0.0]))
    color = jnp.where(valid[..., None], 0.5 * diffuse, 0.0)
    light_dir = normalize(jnp.asarray([-1.0, -1.0, -1.0]))
    # `ng` must arrive normalized (callers normalize exactly once —
    # double normalization would perturb the bit-exact golden gates)
    ndotl = jnp.clip(-dot(jnp.broadcast_to(light_dir, d.shape), ng),
                     0.0, 1.0)
    color = color + jnp.where((valid & ~occ)[..., None],
                              diffuse * ndotl[..., None], 0.0)
    return color.reshape(height, width, 3)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def render(cscene: CommittedScene, cam_vx, cam_vy, cam_vz, cam_p,
           perm=None, inv=None, *, width: int, height: int):
    valid, occ, geom_id, _prim, _u, _v, ng, d = trace(
        cscene, cam_vx, cam_vy, cam_vz, cam_p, perm, inv,
        width=width, height=height)
    # compressed hits carry the dummy Ng (1,0,0): fall back to facing the
    # ray when |ng| is the dummy (the displacement tutorial uses raw Ng;
    # grid/eager modes have true normals)
    ngn = normalize(ng)
    dummy = (ng[..., 0] == 1.0) & (ng[..., 1] == 0.0) & (ng[..., 2] == 0.0)
    ngn = jnp.where(dummy[..., None], -d, ngn)
    return _shade(valid, occ, geom_id, ngn, d, width, height)


def render_frame(state, camera: Camera, size):
    from ..camera import pixel_morton_order_device
    w, h = size
    vx, vy, vz, p = camera.ispc_camera(w, h)
    perm, inv = pixel_morton_order_device(w, h)
    img = render(state["cscene"], vx, vy, vz, p, perm, inv,
                 width=w, height=h)
    return img, 2 * w * h


def make_app() -> TutorialApplication:
    def _build(app):
        # the device hardcodes SUBDIVISION_LEVEL/COMPRESSED_LEVELS via
        # rtcSetSceneLevels (:144); only the accel mode comes from the CLI
        args = getattr(app, "args", None)
        mode = getattr(args, "subdiv_mode", None) if args else None
        return build_scene(mode)

    app = TutorialApplication("displacement_geometry", _build, render_frame)
    app.camera = Camera(from_=(2.5, 2.5, 2.5), to=(0, 0, 0))
    return app


if __name__ == "__main__":
    raise SystemExit(make_app().run())
