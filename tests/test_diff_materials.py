"""FD-validated gradients through the real pathtracer materials.

VERDICT r2 #8: gradients w.r.t. the pathtracer material parameters
(MATTE kd; OBJ kd/ks/ns; METAL eta/k/roughness; VELVET; METALLIC_PAINT
eta) through `eval_brdf` at frozen hits — not the lambert stand-in.
Reference lobes: pathtracer_device.cpp:458-760.
"""
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.diff.materials import freeze_hits, material_loss
from embree_tpu.render.materials import (MAT_MATTE, MAT_METAL,
                                         MAT_METALLIC_PAINT, MAT_OBJ,
                                         MAT_VELVET, make_material_table)
from embree_tpu.verify.fixtures import triangle_sphere

import jax
import jax.numpy as jnp


def _scene_and_frozen(mat_dict, rng):
    verts, idx = triangle_sphere((0, 0, 0), 1.0, 12)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(verts, idx))
    cs = s.commit()
    n = 128
    # rays aimed at the sphere from a shell, light offset above
    org = rng.normal(size=(n, 3)).astype(np.float32)
    org = 3.0 * org / np.linalg.norm(org, axis=1, keepdims=True)
    d = -org / np.linalg.norm(org, axis=1, keepdims=True)
    jit = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    d = d + jit
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    rays = et.make_rays(org, d)
    light_p = jnp.asarray([2.0, 3.0, 1.0])
    frozen = freeze_hits(cs, rays, light_p)
    assert int(np.asarray(frozen["lit"]).sum()) > 20
    mt = make_material_table([mat_dict])
    geom_mat = jnp.zeros(1, jnp.int32)
    return mt, frozen, geom_mat


def _fd_check(mt, frozen, geom_mat, field, coord, rel=5e-2, h=1e-3):
    light = (10.0, 10.0, 10.0)

    def loss_field(x):
        return material_loss(mt._replace(**{field: x}), frozen,
                             geom_mat, light)

    def loss_from(mt2):
        return material_loss(mt2, frozen, geom_mat, light)

    g = jax.grad(loss_field)(getattr(mt, field))
    gval = np.asarray(g).reshape(-1)[coord]

    base = np.asarray(getattr(mt, field), np.float64).reshape(-1)
    def with_val(v):
        arr = base.copy()
        arr[coord] = v
        return mt._replace(**{field: jnp.asarray(
            arr.reshape(np.asarray(getattr(mt, field)).shape),
            jnp.float32)})

    f1 = float(loss_from(with_val(base[coord] + h)))
    f0 = float(loss_from(with_val(base[coord] - h)))
    fd = (f1 - f0) / (2 * h)
    assert np.isfinite(gval) and np.isfinite(fd)
    denom = max(abs(fd), 1e-4)
    assert abs(gval - fd) / denom < rel, (field, coord, gval, fd)
    return gval


def test_matte_kd_grad(rng):
    mt, frozen, gm = _scene_and_frozen(
        {"type": MAT_MATTE, "kd": (0.4, 0.6, 0.2)}, rng)
    g = _fd_check(mt, frozen, gm, "kd", 1)
    assert abs(g) > 0


def test_obj_kd_ks_ns_grads(rng):
    mt, frozen, gm = _scene_and_frozen(
        {"type": MAT_OBJ, "kd": (0.5, 0.3, 0.2), "ks": (0.4, 0.4, 0.4),
         "ns": 12.0}, rng)
    assert abs(_fd_check(mt, frozen, gm, "kd", 0)) > 0
    assert abs(_fd_check(mt, frozen, gm, "ks", 2)) > 0
    _fd_check(mt, frozen, gm, "ns", 0, rel=8e-2)


def test_metal_eta_k_rough_grads(rng):
    mt, frozen, gm = _scene_and_frozen(
        {"type": MAT_METAL, "ks": (0.9, 0.7, 0.5), "eta": 1.4, "k": 3.0,
         "roughness": 0.2}, rng)
    assert abs(_fd_check(mt, frozen, gm, "eta", 0, rel=8e-2)) > 0
    assert abs(_fd_check(mt, frozen, gm, "k", 0, rel=8e-2)) > 0
    assert abs(_fd_check(mt, frozen, gm, "rough", 0, rel=8e-2,
                         h=1e-4)) > 0


def test_velvet_grads(rng):
    mt, frozen, gm = _scene_and_frozen(
        {"type": MAT_VELVET, "kd": (0.6, 0.2, 0.2), "ks": (0.3, 0.3, 0.3),
         "ns": 8.0, "roughness": 6.0}, rng)
    assert abs(_fd_check(mt, frozen, gm, "kd", 0)) > 0
    _fd_check(mt, frozen, gm, "ns", 0, rel=8e-2)


def test_metallic_paint_eta_grad(rng):
    mt, frozen, gm = _scene_and_frozen(
        {"type": MAT_METALLIC_PAINT, "kd": (0.7, 0.2, 0.2), "eta": 1.6},
        rng)
    assert abs(_fd_check(mt, frozen, gm, "kd", 0)) > 0
    _fd_check(mt, frozen, gm, "eta", 0, rel=8e-2)


def test_material_optimization_step(rng):
    """End-to-end: recover a target kd by gradient descent through the
    frozen-hit shading (the train-step shape of diff/render.py, with
    the real BRDF)."""
    mt, frozen, gm = _scene_and_frozen(
        {"type": MAT_OBJ, "kd": (0.2, 0.2, 0.2)}, rng)
    target_mt = mt._replace(kd=jnp.asarray([[0.7, 0.4, 0.1]]))
    from embree_tpu.diff.materials import shade_hits
    target = shade_hits(target_mt, frozen, gm, (10.0, 10.0, 10.0))

    kd = mt.kd
    loss_fn = jax.jit(lambda kd: material_loss(
        mt._replace(kd=kd), frozen, gm, (10.0, 10.0, 10.0), target))
    g_fn = jax.jit(jax.grad(loss_fn))
    l0 = float(loss_fn(kd))
    for _ in range(300):
        kd = kd - 30.0 * g_fn(kd)
    l1 = float(loss_fn(kd))
    assert l1 < 0.05 * l0
    np.testing.assert_allclose(np.asarray(kd)[0],
                               [0.7, 0.4, 0.1], atol=0.05)


# --------------------------------------------------------------------------
# round 4: multi-bounce material gradients (VERDICT r4 #6)
# --------------------------------------------------------------------------

def _indirect_scene():
    """Floor point P blocked from the point light by an occluder; a tall
    lit wall bounces light back to P — the camera pixel at P is
    bounce-2-only (its radiance exists only through one diffuse bounce
    off the wall, pathtracer_device.cpp:1442-1546 semantics)."""
    import jax.numpy as jnp
    from embree_tpu import Device, Scene, QuadMesh
    from embree_tpu.render.materials import MAT_MATTE, make_material_table
    from embree_tpu.render.lights import LIGHT_POINT, make_light_table

    dev = Device("ignore_config_files=1")
    scene = Scene(dev)
    mats, geom_mat = [], []

    def add_quad(p0, du, dv, mat):
        p0 = np.asarray(p0, np.float32)
        v = np.stack([p0, p0 + du, p0 + np.asarray(du) + np.asarray(dv),
                      p0 + dv]).astype(np.float32)
        q = np.asarray([[0, 1, 2, 3]], np.int64)
        gid = scene.attach(QuadMesh(v, q))
        while len(geom_mat) <= gid:
            geom_mat.append(0)
        geom_mat[gid] = len(mats)
        mats.append(mat)

    # floor (target surface), extends around origin
    add_quad((-3, 0, -3), (6, 0, 0), (0, 0, 6),
             dict(type=MAT_MATTE, kd=(0.7, 0.7, 0.7)))
    # wall at x=2, facing -x, tall
    add_quad((2, 0, -3), (0, 3, 0), (0, 0, 6),
             dict(type=MAT_MATTE, kd=(0.2, 0.8, 0.3)))
    # occluder: small quad directly between light (0,2,0) and P=(0,0,0)
    add_quad((-0.4, 1.0, -0.4), (0.8, 0, 0), (0, 0, 0.8),
             dict(type=MAT_MATTE, kd=(0.05, 0.05, 0.05)))
    cs = scene.commit()
    mt = make_material_table(mats)
    lt = make_light_table([{"type": LIGHT_POINT, "pos": (0.0, 2.0, 0.0),
                            "radiance": (30.0, 30.0, 30.0)}])
    return cs, mt, lt, jnp.asarray(np.asarray(geom_mat, np.int32))


def test_multibounce_material_grads_fd():
    """d(pixel)/d(kd_wall) of a bounce-2-only pixel matches FD through
    the REAL multi-bounce accumulation (throughput product + per-bounce
    NEE). The pixel's direct NEE is occluded, so a nonzero wall-kd
    gradient can only flow through the bounce-1 throughput product."""
    import jax.numpy as jnp
    from embree_tpu.core.rayhit import Rays
    from embree_tpu.diff.materials import path_grads
    from embree_tpu.render.tutorials.pathtracer import render_pt
    from embree_tpu.scene.scene import scene_occluded

    cs, mt, lt, geom_mat = _indirect_scene()

    # camera: straight down at P=(0,0,0) from (0, 1.5, 0.9); 1x1 pixel
    cam_p = jnp.asarray([0.0, 1.5, 0.9], jnp.float32)
    to = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    vz = (to - cam_p) / jnp.linalg.norm(to - cam_p)
    # pixel_coords(1,1) gives x,y in [-0.5, 0.5); tiny fov via small vx,vy
    vx = jnp.asarray([1e-3, 0.0, 0.0], jnp.float32)
    vy = jnp.cross(vz, vx)
    vy = 1e-3 * vy / jnp.linalg.norm(vy)

    # sanity: P is occluded from the light
    P = np.array([[0.0, 0.0, 0.0]], np.float32)
    L = np.array([0.0, 2.0, 0.0], np.float32)
    wi = (L - P) / np.linalg.norm(L - P, axis=-1, keepdims=True)
    sh = Rays(jnp.asarray(P), jnp.asarray(wi),
              jnp.asarray([1e-3], jnp.float32),
              jnp.asarray([np.linalg.norm(L - P[0]) * 0.999], jnp.float32))
    assert bool(np.asarray(scene_occluded(cs, sh))[0])

    kw = dict(width=1, height=1, spp=16, max_path=3, n_lights=1, seed=3)
    img, g = path_grads(cs, mt, lt, geom_mat,
                        vx, vy, vz, cam_p, fields=("kd",), **kw)
    img = np.asarray(img)
    assert img.sum() > 1e-4, "pixel must be indirectly lit"
    g_kd = np.asarray(g["kd"])            # (n_mats, 3)
    assert np.abs(g_kd[1]).max() > 1e-5, "wall kd must matter (bounce 2)"

    # FD on the wall kd green channel
    eps = 1e-2
    def run(mt_):
        return float(np.asarray(render_pt(
            cs, mt_, lt, geom_mat, vx, vy, vz, cam_p, kw["seed"],
            width=1, height=1, spp=kw["spp"], n_lights=1,
            max_path=kw["max_path"])).sum())

    kd = np.asarray(mt.kd).copy()
    kdp = kd.copy(); kdp[1, 1] += eps
    kdm = kd.copy(); kdm[1, 1] -= eps
    fd = (run(mt._replace(kd=jnp.asarray(kdp)))
          - run(mt._replace(kd=jnp.asarray(kdm)))) / (2 * eps)
    an = g_kd[1, 1]
    assert abs(fd - an) < 5e-2 * max(abs(fd), 1e-3), (fd, an)

    # floor kd gradient also flows (both bounce-0 brdf and throughput)
    assert np.abs(g_kd[0]).max() > 1e-5
