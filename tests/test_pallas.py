"""Pallas traversal kernel vs XLA reference path (interpret mode on CPU).

The pallas megakernel is the TPU production traversal; these tests run it
through the pallas interpreter so CI (CPU) validates the exact kernel
logic that ships to hardware."""
import jax.numpy as jnp
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.traverse.pallas_packet import (intersect_pallas,
                                              occluded_pallas, pack_scene)
from embree_tpu.verify.fixtures import random_triangles, triangle_sphere


def _committed(verts, idx):
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    return scene.commit()


@pytest.mark.parametrize("ntri,nray", [(5, 64), (60, 100)])
def test_pallas_matches_xla(rng, ntri, nray):
    verts, idx = random_triangles(rng, ntri, extent=5.0, size=1.0)
    cs = _committed(verts, idx)
    assert cs.pallas is not None

    org = rng.uniform(-8, 8, (nray, 3)).astype(np.float32)
    d = rng.normal(size=(nray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)

    ref = et.scene_intersect(cs, rays, isa="xla")
    got = intersect_pallas(cs.pallas, cs.tris, rays, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.prim_id)[m],
                                  np.asarray(ref.prim_id)[m])
    np.testing.assert_allclose(np.asarray(got.u)[m], np.asarray(ref.u)[m],
                               rtol=1e-4, atol=1e-6)


def test_pallas_occluded_matches(rng):
    verts, idx = random_triangles(rng, 30, extent=5.0, size=1.0)
    cs = _committed(verts, idx)
    org = rng.uniform(-8, 8, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    rays = et.make_rays(org, d)
    ref = et.scene_occluded(cs, rays, isa="xla")
    got = occluded_pallas(cs.pallas, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_nonmultiple_packet(rng):
    """Ray counts that are not a multiple of 1024 pad correctly."""
    verts, idx = random_triangles(rng, 10)
    cs = _committed(verts, idx)
    for nray in (7, 1025):
        org = rng.uniform(-5, 5, (nray, 3)).astype(np.float32)
        d = rng.normal(size=(nray, 3)).astype(np.float32)
        rays = et.make_rays(org, d)
        ref = et.scene_intersect(cs, rays, isa="xla")
        got = intersect_pallas(cs.pallas, cs.tris, rays, interpret=True)
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(ref.valid))


def test_pack_scene_roundtrip(rng):
    verts, idx = random_triangles(rng, 64)
    cs = _committed(verts, idx)
    ps = cs.pallas
    # node rows: stride-W fields [lo_x lo_y lo_z hi_x hi_y hi_z child count]
    W = ps.width
    lo = np.asarray(cs.bvh.lower)
    rows = np.asarray(ps.nodes)
    np.testing.assert_allclose(rows[:, 0:W], lo[:, :, 0])
    np.testing.assert_allclose(rows[:, 6 * W:7 * W].astype(np.int32),
                               np.asarray(cs.bvh.child))
    # triangle rows are prim_order-ordered
    order = np.asarray(cs.bvh.prim_order)
    v0 = np.asarray(cs.tris.v0)[order]
    trows = np.asarray(ps.tdata)
    for k in range(min(12, order.size)):
        r, c = k // 10, (k % 10) * 12
        np.testing.assert_allclose(trows[r, c:c + 3], v0[k])
