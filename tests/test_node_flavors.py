"""Compressed node flavors: com (4 B), non (8 B), mid (2 B)
(compressed_node.h:241-396 storage layouts)."""
import numpy as np
import pytest

import embree_tpu as et


def _sphere_scene(flavor):
    dev = et.Device("ignore_config_files=1,"
                    f"subdiv_accel=bvh4.compressed.box,"
                    f"compressed_node={flavor}")
    s = et.Scene(dev)
    # subdivision sphere from a cube control cage
    v = np.asarray([
        [-1, -1, -1], [1, -1, -1], [1, -1, 1], [-1, -1, 1],
        [-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]], np.float32)
    q = np.asarray([[0, 4, 5, 1], [1, 5, 6, 2], [2, 6, 7, 3],
                    [0, 3, 7, 4], [4, 7, 6, 5], [0, 1, 2, 3]], np.int32)
    s.attach(et.SubdivMesh(v, np.full(6, 4, np.int32), q.reshape(-1)))
    s.set_levels(4, 3)
    s.commit()
    return s


def _trace(s, n=4096, seed=5):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = -3.0 * d  # rays aimed at the origin from a shell
    return s.intersect(et.make_rays(org, d))


@pytest.mark.parametrize("flavor", ["com", "non", "mid"])
def test_flavor_hits_surface(flavor):
    s = _sphere_scene(flavor)
    h = _trace(s)
    frac = float(np.asarray(h.valid).mean())
    assert frac > 0.95, f"{flavor}: only {frac:.2%} rays hit"
    t = np.asarray(h.t)[np.asarray(h.valid)]
    # the subdivided cube's limit surface radius is in [0.5, 1.8]
    assert ((t > 1.0) & (t < 2.6)).mean() > 0.99


def test_flavor_accuracy_ordering():
    """non (independent planes) must box the surface at least as tightly
    as com on average; both within tolerance of each other."""
    hits = {f: _trace(_sphere_scene(f)) for f in ("com", "non", "mid")}
    t = {f: np.asarray(h.t) for f, h in hits.items()}
    valid_all = (np.asarray(hits["com"].valid)
                 & np.asarray(hits["non"].valid)
                 & np.asarray(hits["mid"].valid))
    # box mode: hit t = entry of reconstructed leaf box; looser boxes hit
    # earlier, so mean t orders by tightness: non >= com >= mid
    m = {f: t[f][valid_all].mean() for f in t}
    assert m["non"] >= m["com"] - 1e-3
    assert m["com"] >= m["mid"] - 1e-3
    # all three agree within the quantization tolerance of each other
    assert abs(m["non"] - m["mid"]) < 0.25


def test_flavor_node_bytes():
    from embree_tpu.build.cbvh import build_compressed_tiles
    rng = np.random.default_rng(1)
    g = 4  # comp level 2
    tv = rng.uniform(0, 1, (3, g + 1, g + 1, 3)).astype(np.float32)
    tv[..., 2] *= 0.1
    uv0 = np.zeros((3, 2), np.float32)
    uvd = np.ones((3, 2), np.float32)
    gid = np.zeros(3, np.int64)
    pid = np.arange(3, dtype=np.int64)
    for flavor, width in (("com", 4), ("non", 8), ("mid", 2)):
        r = build_compressed_tiles(tv, None, uv0, uvd, gid, pid, 2, "box",
                                   flavor=flavor)
        assert r.tiles.nodes.shape[-1] == width
        assert r.tiles.flavor == flavor
        vals = np.asarray(r.tiles.nodes)
        assert (vals >= 0).all() and (vals <= 255).all()
