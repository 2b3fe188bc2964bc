"""BVH tree rotations (bvh_rotate.{h,cpp} analog)."""
import numpy as np

from embree_tpu.build.bvh import sah_cost
from embree_tpu.build.rotate import rotate_bvh
from embree_tpu.build.sah import BuildSettings, build_bvh2, collapse_to_wide


def _random_prims(n, seed=3):
    rng = np.random.default_rng(seed)
    lo = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    return lo, lo + rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)


def _median_tree(lo, hi):
    """Deliberately poor tree: median splits along x only."""
    from embree_tpu.build.user_builder import _morton_bvh2
    child2, nlo2, nhi2, order, root, leaf_mult = _morton_bvh2(lo, hi, 4)
    return collapse_to_wide(child2, nlo2, nhi2, order, leaf_mult=leaf_mult,
                            root_ref=root, width=4,
                            prim_lower=lo, prim_upper=hi)


def _leaf_prims(bvh):
    out = []
    for n in range(bvh.child.shape[0]):
        for c in range(bvh.child.shape[1]):
            if bvh.count[n, c] > 0:
                s = bvh.child[n, c]
                out.extend(bvh.prim_order[s:s + bvh.count[n, c]].tolist())
    return sorted(out)


def test_rotation_reduces_sah():
    lo, hi = _random_prims(600)
    bvh = _median_tree(lo, hi)
    before = sah_cost(bvh)
    rot = rotate_bvh(bvh, rounds=2)
    after = sah_cost(rot)
    assert after < before * 0.999


def test_rotation_preserves_prims_and_containment():
    lo, hi = _random_prims(300, seed=9)
    bvh = _median_tree(lo, hi)
    rot = rotate_bvh(bvh, rounds=1)
    assert _leaf_prims(rot) == _leaf_prims(bvh)
    # every leaf child box still contains its prims
    for n in range(rot.child.shape[0]):
        for c in range(rot.child.shape[1]):
            cnt = rot.count[n, c]
            if cnt > 0:
                sel = rot.prim_order[rot.child[n, c]:rot.child[n, c] + cnt]
                assert (rot.lower[n, c] <= lo[sel].min(0) + 1e-5).all()
                assert (rot.upper[n, c] >= hi[sel].max(0) - 1e-5).all()


def test_rotated_tree_traverses_identically():
    import embree_tpu as et
    import jax.numpy as jnp
    from embree_tpu.traverse.packet import intersect_chunked
    from embree_tpu.core.rayhit import Rays
    from embree_tpu.verify.fixtures import triangle_sphere

    verts, idx = triangle_sphere((0, 0, 0), 1.5, 12)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(verts, idx))
    cs = s.commit()

    from embree_tpu.build.bvh import BVHArraysNP
    host = BVHArraysNP(np.asarray(cs.bvh.lower), np.asarray(cs.bvh.upper),
                       np.asarray(cs.bvh.child), np.asarray(cs.bvh.count),
                       np.asarray(cs.bvh.prim_order))
    rot = rotate_bvh(host, rounds=1).to_device()

    rng = np.random.default_rng(0)
    org = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays(jnp.asarray(org), jnp.asarray(d),
                jnp.zeros(256), jnp.full(256, np.inf))
    h0 = intersect_chunked(cs.bvh, cs.tris, rays)
    h1 = intersect_chunked(rot, cs.tris, rays)
    np.testing.assert_allclose(np.asarray(h0.t), np.asarray(h1.t),
                               rtol=1e-6)
    assert (np.asarray(h0.prim_id) == np.asarray(h1.prim_id)).all()
