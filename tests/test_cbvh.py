"""Compressed cBVH accel tests (the fork's core paper contribution;
kernels/geometry/compressed*.{h,cpp} semantics)."""
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.build.cbvh import (TABLE_BORDER, TABLE_MID, lookup_idx,
                                   morton2_decode, morton2_encode)
from embree_tpu.verify.fixtures import subdiv_cube


def _scene(mode, displacement=None, levels=(3, 2)):
    verts, counts, indices = subdiv_cube()
    dev = et.Device(f"ignore_config_files=1,subdiv_accel=bvh4.compressed.{mode}")
    s = et.Scene(dev)
    s.attach(et.SubdivMesh(verts, counts, indices, displacement=displacement))
    s.set_levels(*levels)
    s.commit()
    return s


def _eager(displacement=None, levels=(3, 2)):
    verts, counts, indices = subdiv_cube()
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.SubdivMesh(verts, counts, indices, displacement=displacement))
    s.set_levels(*levels)
    s.commit()
    return s


def _rand_rays(rng, n=1500):
    org = rng.normal(size=(n, 3)).astype(np.float32)
    org = org / np.linalg.norm(org, axis=1, keepdims=True) * 4.0
    d = -org / 4.0 + rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return et.make_rays(org, d)


def test_morton_roundtrip(rng):
    codes = np.arange(256, dtype=np.uint32)
    x, y = morton2_decode(codes)
    np.testing.assert_array_equal(morton2_encode(x, y), codes)


def test_lookup_floor_semantics():
    """lookUpIdx picks the largest table value <= input
    (compressed_node.h:46-55)."""
    assert lookup_idx(TABLE_BORDER, np.float32(0.004)) == 0
    assert lookup_idx(TABLE_BORDER, np.float32(0.005)) == 1
    assert lookup_idx(TABLE_BORDER, np.float32(0.7)) == 7
    assert lookup_idx(TABLE_BORDER, np.float32(-0.1)) == 0
    assert lookup_idx(TABLE_MID, np.float32(0.505)) == 4


def test_grid_mode_matches_eager(rng):
    se = _eager()
    sg = _scene("grid")
    rays = _rand_rays(rng)
    he = se.intersect(rays)
    hg = sg.intersect(rays)
    ve, vg = np.asarray(he.valid), np.asarray(hg.valid)
    assert (ve == vg).mean() > 0.999
    both = ve & vg
    np.testing.assert_allclose(np.asarray(hg.t)[both], np.asarray(he.t)[both],
                               atol=2e-3)


@pytest.mark.parametrize("mode", ["box", "leaf", "full"])
def test_conservative_modes(rng, mode):
    """box/leaf/full hit everything the exact surface hits, slightly
    earlier (conservative quantized bounds never miss)."""
    se = _eager()
    sc = _scene(mode)
    rays = _rand_rays(rng, 1000)
    he = se.intersect(rays)
    hc = sc.intersect(rays)
    ve, vc = np.asarray(he.valid), np.asarray(hc.valid)
    # every exact hit must be found by the conservative approximation
    assert (vc | ~ve).mean() > 0.999, f"{mode} missed exact hits"
    both = ve & vc
    dt = np.asarray(he.t)[both] - np.asarray(hc.t)[both]
    assert dt.min() > -2e-2, f"{mode} hit behind exact surface"
    assert np.abs(dt).max() < 0.5, f"{mode} approximation error too large"


def test_uv_in_patch_range(rng):
    sc = _scene("grid")
    rays = _rand_rays(rng, 500)
    h = sc.intersect(rays)
    v = np.asarray(h.valid)
    assert np.asarray(h.u)[v].min() >= -1e-4
    assert np.asarray(h.u)[v].max() <= 1 + 1e-4
    assert np.asarray(h.v)[v].min() >= -1e-4
    # prim ids are base face ids 0..5
    assert set(np.unique(np.asarray(h.prim_id)[v])) <= set(range(6))


def test_occluded_conservative(rng):
    """Compressed occlusion is conservative: every intersect hit is
    occluded (compressed.h:754-756)."""
    sc = _scene("box")
    rays = _rand_rays(rng, 500)
    h = sc.intersect(rays)
    occ = sc.occluded(rays)
    v = np.asarray(h.valid)
    assert (np.asarray(occ) | ~v).all()


def test_displacement_modes(rng):
    def displ(p, ng, u, v):
        return p + 0.15 * ng * np.sin(5 * p[..., :1])

    se = _eager(displacement=displ)
    sg = _scene("grid", displacement=displ)
    rays = _rand_rays(rng, 800)
    he = se.intersect(rays)
    hg = sg.intersect(rays)
    ve, vg = np.asarray(he.valid), np.asarray(hg.valid)
    assert (ve == vg).mean() > 0.995
    both = ve & vg
    np.testing.assert_allclose(np.asarray(hg.t)[both], np.asarray(he.t)[both],
                               atol=5e-3)
    # leaf mode (pizza boxes) still catches all exact hits
    sl = _scene("leaf", displacement=displ)
    hl = sl.intersect(rays)
    assert (np.asarray(hl.valid) | ~ve).mean() > 0.995


def test_interpolate_smooth_normals(rng):
    sc = _scene("grid")
    rays = _rand_rays(rng, 200)
    h = sc.intersect(rays)
    v = np.asarray(h.valid)
    import jax.numpy as jnp
    P, N = sc.interpolate(0, h.prim_id, h.u, h.v)
    P, N = np.asarray(P), np.asarray(N)
    # interpolated position is close to the ray hit point
    hitp = np.asarray(rays.org) + np.asarray(h.t)[:, None] * np.asarray(rays.dir)
    err = np.linalg.norm((P - hitp)[v], axis=1)
    assert np.median(err) < 5e-2
    # normals are unit and roughly outward (positive dot with position)
    nl = np.linalg.norm(N[v], axis=1)
    np.testing.assert_allclose(nl, 1.0, atol=1e-3)
    outward = (N[v] * P[v]).sum(1)
    assert (outward > 0).mean() > 0.99


def test_memory_footprint():
    """Paper headline: 'com' node = 4 bytes, pizza leaf = 2 bytes/cell
    (compressed_node.h:264, compressed_leaf.h:22-47)."""
    sc = _scene("leaf", levels=(4, 3))
    tiles = sc.committed.compressed.tiles
    n_nodes = tiles.nodes.shape[1]
    cells = (1 << tiles.comp_level) ** 2
    assert n_nodes == (4 ** tiles.comp_level - 1) // 3
    # logical compressed payload per tile
    logical_bytes = n_nodes * 4 + cells * 2
    assert logical_bytes == 21 * 4 + 64 * 2  # cl=3: 21 nodes, 64 cells
