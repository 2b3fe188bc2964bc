"""Morton builder + refit + dynamic scene tests (buildbench taxonomy,
tutorials/buildbench + bvh_refit.cpp analogs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.build.morton import build_morton, morton3d
from embree_tpu.build.refit import plan_refit, refit
from embree_tpu.scene.prims import prim_bounds_np
from embree_tpu.traverse.packet import intersect_packet
from embree_tpu.scene.prims import TrianglePrims
from embree_tpu.verify.fixtures import random_triangles, triangle_sphere


def _tris(verts, idx):
    v0 = jnp.asarray(verts[idx[:, 0]])
    v1 = jnp.asarray(verts[idx[:, 1]])
    v2 = jnp.asarray(verts[idx[:, 2]])
    n = idx.shape[0]
    return TrianglePrims(v0, v1, v2, jnp.zeros(n, jnp.int32),
                         jnp.arange(n, dtype=jnp.int32),
                         jnp.zeros(n, jnp.int32))


def _validate(bvh, lower, upper):
    P = lower.shape[0]
    seen = np.zeros(P, np.int64)
    child = np.asarray(bvh.child); count = np.asarray(bvh.count)
    blo = np.asarray(bvh.lower); bhi = np.asarray(bvh.upper)
    order = np.asarray(bvh.prim_order)
    stack = [0]; visited = set()
    while stack:
        n = stack.pop()
        assert n not in visited
        visited.add(n)
        for c in range(4):
            if count[n, c] < 0:
                continue
            if count[n, c] == 0:
                stack.append(int(child[n, c]))
            else:
                s, k = int(child[n, c]), int(count[n, c])
                prims = order[s:s + k]
                seen[prims] += 1
                assert (blo[n, c] <= lower[prims].min(0) + 1e-4).all()
                assert (bhi[n, c] >= upper[prims].max(0) - 1e-4).all()
    assert (seen == 1).all()


def test_morton_codes():
    c = morton3d(jnp.asarray([1, 0, 0], jnp.uint32),
                 jnp.asarray([0, 1, 0], jnp.uint32),
                 jnp.asarray([0, 0, 1], jnp.uint32))
    assert list(np.asarray(c)) == [1, 2, 4]


@pytest.mark.parametrize("n", [1, 3, 16, 333, 4000])
def test_morton_build_valid(rng, n):
    verts, idx = random_triangles(rng, n)
    lo, hi = prim_bounds_np(verts[idx[:, 0]], verts[idx[:, 1]], verts[idx[:, 2]])
    bvh = build_morton(jnp.asarray(lo), jnp.asarray(hi))
    _validate(bvh, lo, hi)


def test_morton_traversal_matches_sah(rng):
    verts, idx = random_triangles(rng, 400, extent=5.0, size=1.0)
    lo, hi = prim_bounds_np(verts[idx[:, 0]], verts[idx[:, 1]], verts[idx[:, 2]])
    bvh = build_morton(jnp.asarray(lo), jnp.asarray(hi))
    tris = _tris(verts, idx)
    org = rng.uniform(-8, 8, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    rays = et.make_rays(org, d)
    h_m = intersect_packet(bvh, tris, rays)

    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()
    h_s = et.scene_intersect(cs, rays, isa="xla")
    np.testing.assert_array_equal(np.asarray(h_m.valid), np.asarray(h_s.valid))
    m = np.asarray(h_s.valid)
    np.testing.assert_allclose(np.asarray(h_m.t)[m], np.asarray(h_s.t)[m],
                               rtol=1e-5)


def test_refit_after_deformation(rng):
    verts, idx = triangle_sphere((0, 0, 0), 1.0, 16)
    lo, hi = prim_bounds_np(verts[idx[:, 0]], verts[idx[:, 1]], verts[idx[:, 2]])
    from embree_tpu.build.sah import build_sah
    bvh = build_sah(lo, hi).to_device()
    sched = plan_refit(bvh)

    # deform: scale by 1.7
    verts2 = verts * 1.7
    lo2, hi2 = prim_bounds_np(verts2[idx[:, 0]], verts2[idx[:, 1]],
                              verts2[idx[:, 2]])
    bvh2 = refit(bvh, sched, jnp.asarray(lo2), jnp.asarray(hi2))
    _validate(bvh2, lo2, hi2)

    # traversal on the refit tree hits the deformed sphere
    tris = _tris(verts2, idx)
    n = 200
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(np.zeros((n, 3), np.float32), d)
    h = intersect_packet(bvh2, tris, rays)
    assert np.asarray(h.valid).mean() > 0.999
    np.testing.assert_allclose(np.asarray(h.t)[np.asarray(h.valid)], 1.7,
                               atol=0.05)


def test_morton_build_is_jittable_dynamic(rng):
    """Device-side rebuild per 'frame' under jit (dynamic_scene analog)."""
    verts, idx = random_triangles(rng, 100)
    v0 = jnp.asarray(verts[idx[:, 0]]); v1 = jnp.asarray(verts[idx[:, 1]])
    v2 = jnp.asarray(verts[idx[:, 2]])

    @jax.jit
    def frame(shift):
        a, b, c = v0 + shift, v1 + shift, v2 + shift
        lo = jnp.minimum(jnp.minimum(a, b), c)
        hi = jnp.maximum(jnp.maximum(a, b), c)
        bvh = build_morton(lo, hi)
        return bvh.lower.min(), bvh.upper.max()

    l0, u0 = frame(jnp.zeros(3))
    l1, u1 = frame(jnp.ones(3) * 5)
    assert float(l1) > float(l0)
