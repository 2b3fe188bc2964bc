"""Pallas compressed-traversal kernel vs XLA reference (interpret mode)."""
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.verify.fixtures import subdiv_cube


def _scene(mode):
    verts, counts, indices = subdiv_cube()
    dev = et.Device(f"ignore_config_files=1,subdiv_accel=bvh4.compressed.{mode}")
    s = et.Scene(dev)
    s.attach(et.SubdivMesh(verts, counts, indices))
    s.set_levels(2, 2)
    s.commit()
    return s


def _rays(rng, n=48):
    org = rng.normal(size=(n, 3)).astype(np.float32)
    org = org / np.linalg.norm(org, axis=1, keepdims=True) * 4.0
    d = -org / 4.0 + rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return et.make_rays(org, d)


@pytest.mark.parametrize("mode", ["box", "leaf", "grid"])
def test_pallas_cbvh_matches_xla(rng, mode):
    s = _scene(mode)
    cs = s.committed
    assert cs.compressed_pallas is not None
    rays = _rays(rng)
    hx = et.scene_intersect(cs, rays, isa="xla")
    hp = et.scene_intersect(cs, rays, isa="pallas")
    vx, vp = np.asarray(hx.valid), np.asarray(hp.valid)
    np.testing.assert_array_equal(vx, vp)
    both = vx & vp
    np.testing.assert_allclose(np.asarray(hp.t)[both], np.asarray(hx.t)[both],
                               atol=1e-5)
    if mode != "box":  # box-mode uv derives from the entry point (crude)
        np.testing.assert_allclose(np.asarray(hp.u)[both],
                                   np.asarray(hx.u)[both], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(hp.geom_id)[both],
                                  np.asarray(hx.geom_id)[both])


def test_pallas_cbvh_occluded_matches(rng):
    s = _scene("leaf")
    cs = s.committed
    rays = _rays(rng)
    ox = np.asarray(et.scene_occluded(cs, rays, isa="xla"))
    op = np.asarray(et.scene_occluded(cs, rays, isa="pallas"))
    np.testing.assert_array_equal(ox, op)
