"""Traversal correctness vs brute force (verify.cpp IntersectTest analog
:2118-2905) + statistical watertightness gate (:2635-2712)."""
import jax.numpy as jnp
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.traverse.moeller import intersect_triangle
from embree_tpu.verify.fixtures import random_triangles, triangle_sphere


def brute_force_hit(tris_v0, tris_v1, tris_v2, org, dirs, tnear, tfar):
    """Reference O(R*T) closest hit: returns (t, prim)."""
    valid, t, _u, _v, _ng = intersect_triangle(
        org[:, None, :], dirs[:, None, :], tnear[:, None], tfar[:, None],
        tris_v0[None], tris_v1[None], tris_v2[None])
    t = jnp.where(valid, t, jnp.inf)
    prim = jnp.argmin(t, axis=1)
    tbest = jnp.min(t, axis=1)
    return jnp.where(jnp.isfinite(tbest), tbest, jnp.inf), \
        jnp.where(jnp.isfinite(tbest), prim, -1)


def _scene_from(verts, idx):
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    scene.commit()
    return scene


@pytest.mark.parametrize("ntri,nray", [(1, 64), (33, 128), (500, 256)])
def test_closest_hit_matches_brute_force(rng, ntri, nray):
    verts, idx = random_triangles(rng, ntri, extent=5.0, size=1.0)
    scene = _scene_from(verts, idx)

    org = rng.uniform(-8, 8, (nray, 3)).astype(np.float32)
    d = rng.normal(size=(nray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)

    hits = scene.intersect(rays)

    v0 = jnp.asarray(verts[idx[:, 0]])
    v1 = jnp.asarray(verts[idx[:, 1]])
    v2 = jnp.asarray(verts[idx[:, 2]])
    t_ref, _prim_ref = brute_force_hit(
        v0, v1, v2, jnp.asarray(org), jnp.asarray(d),
        jnp.zeros(nray), jnp.full(nray, jnp.inf))

    got_valid = np.asarray(hits.valid)
    ref_valid = np.isfinite(np.asarray(t_ref))
    assert np.array_equal(got_valid, ref_valid)
    np.testing.assert_allclose(np.asarray(hits.t)[got_valid],
                               np.asarray(t_ref)[ref_valid], rtol=1e-4)


def test_occluded_matches_intersect(rng):
    verts, idx = random_triangles(rng, 200, extent=5.0, size=1.0)
    scene = _scene_from(verts, idx)
    org = rng.uniform(-8, 8, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)
    hits = scene.intersect(rays)
    occ = scene.occluded(rays)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hits.valid))


def test_ray_batch_shapes(rng):
    """Rays keep arbitrary batch shape (H, W) through intersect."""
    verts, idx = random_triangles(rng, 20)
    scene = _scene_from(verts, idx)
    org = rng.uniform(-5, 5, (4, 8, 3)).astype(np.float32)
    d = rng.normal(size=(4, 8, 3)).astype(np.float32)
    hits = scene.intersect(et.make_rays(org, d))
    assert hits.t.shape == (4, 8)
    assert hits.ng.shape == (4, 8, 3)


def test_tnear_tfar_respected(rng):
    verts = np.array([[-1, -1, 5], [1, -1, 5], [0, 1, 5]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    scene = _scene_from(verts, idx)
    org = np.zeros((3, 3), np.float32)
    d = np.tile(np.array([0, 0, 1.0], np.float32), (3, 1))
    rays = et.Rays(jnp.asarray(org), jnp.asarray(d),
                   jnp.asarray([0.0, 6.0, 0.0], jnp.float32),
                   jnp.asarray([np.inf, np.inf, 4.0], jnp.float32))
    hits = scene.intersect(rays)
    assert bool(hits.valid[0])
    assert not bool(hits.valid[1])  # tnear beyond the triangle
    assert not bool(hits.valid[2])  # tfar before the triangle


def test_watertight_sphere(rng):
    """WatertightTest analog (verify.cpp:2635-2712): rays from inside a
    closed sphere must hit; miss rate <= 0.002%."""
    verts, idx = triangle_sphere((0, 0, 0), 2.0, 50)
    scene = _scene_from(verts, idx)
    n = 30_000
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = np.zeros((n, 3), np.float32)
    hits = scene.intersect(et.make_rays(org, d))
    miss_rate = 1.0 - np.asarray(hits.valid).mean()
    assert miss_rate <= 2e-5, f"miss rate {miss_rate:.2e}"


def test_nan_inf_rays(rng):
    """NaN/Inf robustness (verify.cpp:2832/:2905): garbage rays must not
    poison valid lanes in the same batch."""
    verts, idx = random_triangles(rng, 50)
    scene = _scene_from(verts, idx)
    org = rng.uniform(-5, 5, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    org[0] = np.nan
    d[1] = np.nan
    d[2] = np.inf
    d[3] = 0.0
    rays = et.make_rays(org, d)
    hits = scene.intersect(rays)
    hits_clean = scene.intersect(et.make_rays(
        np.nan_to_num(org, nan=1e9), np.where(np.abs(d) < 1e30, d, 1.0)))
    # garbage lanes miss; clean lanes unaffected
    assert not bool(hits.valid[0])
    assert not bool(hits.valid[1])
    np.testing.assert_array_equal(np.asarray(hits.valid[4:]),
                                  np.asarray(hits_clean.valid[4:]))


def test_quad_mesh_uv(rng):
    """Quad hit uv covers [0,1]^2 with second-triangle remap (quadv.h)."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    quads = np.array([[0, 1, 2, 3]], np.int32)
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.QuadMesh(verts, quads))
    scene.commit()

    # ray at quad param (0.25, 0.75) -> world point (0.25, 0.75)
    for (qu, qv) in [(0.2, 0.7), (0.7, 0.2), (0.9, 0.9), (0.1, 0.1)]:
        org = np.array([[qu, qv, -1.0]], np.float32)
        d = np.array([[0, 0, 1.0]], np.float32)
        hits = scene.intersect(et.make_rays(org, d))
        assert bool(hits.valid[0])
        # uv parameterization: u along v0->v1, v along v0->v3
        assert abs(float(hits.u[0]) - qu) < 1e-3, (qu, qv, hits.u, hits.v)
        assert abs(float(hits.v[0]) - qv) < 1e-3
