"""Pathtracer, viewer, OBJ loader, lights/materials tests."""
import os
import textwrap

import numpy as np
import pytest

from embree_tpu.render.camera import Camera
from embree_tpu.render.lights import (LIGHT_DIRECTIONAL, LIGHT_POINT,
                                      LIGHT_QUAD, make_light_table,
                                      sample_light)
from embree_tpu.render.materials import (MAT_MATTE, MAT_MIRROR, eval_brdf,
                                         make_material_table, sample_bsdf)
from embree_tpu.render.objloader import load_obj
from embree_tpu.render.tutorials import pathtracer as pt


def test_cornell_render_statistics():
    state = pt.build_cornell_scene()
    cam = Camera(from_=(0.5, 0.5, 2.4), to=(0.5, 0.5, 0.0), fov=40)
    img, _ = pt.render_frame(state, cam, (40, 40), spp=2)
    img = np.asarray(img)
    assert np.isfinite(img).all() and (img >= 0).all()
    assert 0.02 < img.mean() < 1.0
    # color bleeding: left region red-dominant, right green-dominant
    left = img[16:24, 2:6].mean((0, 1))
    right = img[16:24, 34:38].mean((0, 1))
    assert left[0] > left[1] > left[2]
    assert right[1] > right[0]


def test_pathtracer_deterministic_per_seed():
    state = pt.build_cornell_scene()
    cam = Camera(from_=(0.5, 0.5, 2.4), to=(0.5, 0.5, 0.0), fov=40)
    a, _ = pt.render_frame(state, cam, (8, 8), spp=1, seed=0)
    b, _ = pt.render_frame(state, cam, (8, 8), spp=1, seed=0)
    c, _ = pt.render_frame(state, cam, (8, 8), spp=1, seed=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_light_sampling(rng):
    import jax
    lt = make_light_table([
        {"type": LIGHT_POINT, "pos": (0, 2, 0), "radiance": (4, 4, 4)},
        {"type": LIGHT_DIRECTIONAL, "dir": (0, -1, 0), "radiance": (1, 1, 1)},
        {"type": LIGHT_QUAD, "pos": (-0.5, 3, -0.5), "e1": (1, 0, 0),
         "e2": (0, 0, 1), "radiance": (5, 5, 5)},
    ])
    p = np.zeros((8, 3), np.float32)
    key = jax.random.PRNGKey(0)
    wi, dist, w = sample_light(lt, 0, p, key)
    np.testing.assert_allclose(np.asarray(wi)[0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist), 2.0)
    np.testing.assert_allclose(np.asarray(w), 1.0)  # 4 / 2^2
    wi, dist, w = sample_light(lt, 1, p, key)
    np.testing.assert_allclose(np.asarray(wi)[0], [0, 1, 0], atol=1e-6)
    assert np.asarray(dist)[0] > 1e20
    wi, dist, w = sample_light(lt, 2, p, key)
    assert (np.asarray(wi)[:, 1] > 0.9).all()  # roughly up
    assert (np.asarray(w) > 0).all()


def test_material_energy(rng):
    import jax
    mt = make_material_table([
        {"type": MAT_MATTE, "kd": (0.8, 0.4, 0.2)},
        {"type": MAT_MIRROR, "ks": (1.0, 1.0, 1.0)},
    ])
    n = np.tile(np.array([0, 0, 1.0], np.float32), (64, 1))
    wo = np.tile(np.array([0, 0.6, 0.8], np.float32), (64, 1))
    mid = np.zeros(64, np.int32)
    wi, w, delta = sample_bsdf(mt, mid, wo, n, jax.random.PRNGKey(0))
    # cosine-sampled dirs are in the upper hemisphere; weight == kd
    assert (np.asarray(wi)[:, 2] > 0).all()
    np.testing.assert_allclose(np.asarray(w), [[0.8, 0.4, 0.2]] * 64,
                               rtol=1e-5)
    # mirror reflects exactly
    mid1 = np.ones(64, np.int32)
    wi, w, delta = sample_bsdf(mt, mid1, wo, n, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(wi), [[0, -0.6, 0.8]] * 64,
                               atol=1e-5)
    assert np.asarray(delta).all()

    f = eval_brdf(mt, mid, wo, n, wo)  # eval toward wo itself
    assert (np.asarray(f) >= 0).all()


OBJ_CONTENT = """
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
usemtl redmat
f 1 2 3 4
usemtl bluemat
f 1 2 5
"""

MTL_CONTENT = """
newmtl redmat
Kd 0.8 0.1 0.1
Ns 30
newmtl bluemat
Kd 0.1 0.1 0.8
Ks 0.5 0.5 0.5
"""


def test_obj_loader(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ_CONTENT)
    (tmp_path / "test.mtl").write_text(MTL_CONTENT)
    geoms, mats = load_obj(str(tmp_path / "test.obj"))
    assert len(geoms) == 2  # one mesh per material
    assert len(mats) == 3   # default + 2
    total_tris = sum(g.indices.shape[0] for g, _m in geoms)
    assert total_tris == 3  # quad fan (2) + tri (1)
    kds = [m["kd"] for m in mats]
    assert (0.8, 0.1, 0.1) in kds and (0.1, 0.1, 0.8) in kds


def test_viewer_renders_obj(tmp_path):
    from embree_tpu.render.tutorials import viewer
    (tmp_path / "test.obj").write_text(OBJ_CONTENT)
    (tmp_path / "test.mtl").write_text(MTL_CONTENT)
    state = viewer.build_scene(str(tmp_path / "test.obj"))
    cam = Camera(from_=(0.5, 0.5, 3.0), to=(0.5, 0.5, 0.0), fov=45)
    img, _ = viewer.render_frame(state, cam, (32, 32))
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert (img.sum(-1) > 0).mean() > 0.15
    # red quad dominates the view
    lit = img[img.sum(-1) > 0.05]
    assert lit[:, 0].mean() > lit[:, 2].mean()


def test_viewer_textured_obj(tmp_path):
    """map_Kd + vt texcoords flow through to shading."""
    from embree_tpu.render.image import write_ppm
    from embree_tpu.render.tutorials import viewer
    # checkerboard texture
    tex = np.zeros((8, 8, 3), np.float32)
    tex[::2, ::2] = (1, 0, 0)
    tex[1::2, 1::2] = (1, 0, 0)
    write_ppm(str(tmp_path / "check.ppm"), tex)
    (tmp_path / "t.mtl").write_text(
        "newmtl texd\nKd 1 1 1\nmap_Kd check.ppm\n")
    (tmp_path / "t.obj").write_text("""
mtllib t.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl texd
f 1/1 2/2 3/3 4/4
""")
    state = viewer.build_scene(str(tmp_path / "t.obj"))
    cam = Camera(from_=(0.5, 0.5, 2.0), to=(0.5, 0.5, 0.0), fov=45)
    img, _ = viewer.render_frame(state, cam, (32, 32))
    img = np.asarray(img)
    lit = img[img.sum(-1) > 0.05]
    # checkerboard: some red texels, some black -> variance in red channel
    assert lit.shape[0] > 50
    assert lit[:, 0].std() > 0.1  # bilinear-smoothed checker
    assert lit[:, 2].max() < 0.1  # no blue anywhere


def test_material_zoo_render():
    """Each reference material type renders finite, plausible energy
    (pathtracer_device.cpp material zoo :458-760)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import embree_tpu as et
    from embree_tpu.render.lights import LightTable, make_light_table
    from embree_tpu.render.materials import (
        MAT_METAL, MAT_METALLIC_PAINT, MAT_REFLECTIVE_METAL, MAT_VELVET,
        MaterialTable, eval_brdf, make_material_table, sample_bsdf)

    mt = make_material_table([
        {"type": MAT_METAL, "ks": (0.9, 0.8, 0.7), "eta": 1.4, "k": 3.0,
         "roughness": 0.05},
        {"type": MAT_REFLECTIVE_METAL, "ks": (0.95, 0.9, 0.8),
         "eta": 1.4, "k": 3.0},
        {"type": MAT_VELVET, "kd": (0.6, 0.1, 0.1), "ns": 4.0},
        {"type": MAT_METALLIC_PAINT, "kd": (0.1, 0.3, 0.8), "eta": 1.5},
    ])
    n = 256
    rng = np.random.default_rng(5)
    wo = rng.normal(size=(n, 3)).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.2
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    wi = rng.normal(size=(n, 3)).astype(np.float32)
    wi[:, 2] = np.abs(wi[:, 2]) + 0.2
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    nrm = np.tile(np.float32([0, 0, 1]), (n, 1))
    for mid_v in range(4):
        mid = jnp.full((n,), mid_v, jnp.int32)
        f = np.asarray(eval_brdf(mt, mid, jnp.asarray(wo), jnp.asarray(nrm),
                                 jnp.asarray(wi)))
        assert np.isfinite(f).all() and (f >= 0).all(), mid_v
        w_dir, w, delta = sample_bsdf(mt, mid, jnp.asarray(wo),
                                      jnp.asarray(nrm),
                                      jax.random.PRNGKey(1))
        w_dir, w = np.asarray(w_dir), np.asarray(w)
        assert np.isfinite(w_dir).all() and np.isfinite(w).all(), mid_v
        assert (w >= 0).all() and w.max() <= 1.5, mid_v
    # delta lobes carry no NEE contribution
    mid = jnp.full((n,), 1, jnp.int32)  # reflective metal
    f = np.asarray(eval_brdf(mt, mid, jnp.asarray(wo), jnp.asarray(nrm),
                             jnp.asarray(wi)))
    assert np.all(f == 0.0)
