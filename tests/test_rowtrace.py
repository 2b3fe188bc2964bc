"""Per-lane treelet traversal (traverse/rowtrace2.py) vs XLA reference.

Validates the exact kernel logic (interpret mode on CPU) that ships to
hardware as the incoherent-ray fast path: the bitmask-chain consensus
schedule, the packed-bf16 implicit-BVH4 treelet encoding
(build/treelets.py), and the two-chunk leaf drains."""
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.build.treelets import (BLOCK_ROWS, LEAF_FIELDS, NODE_ROWS,
                                       P_CAP, build_treelet_scene,
                                       pack_bf16_bounds)
from embree_tpu.traverse.rowtrace2 import intersect_rowtrace2
from embree_tpu.verify.fixtures import random_triangles, triangle_sphere


def _ref_hits(verts, idx, rays):
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()
    return et.scene_intersect(cs, rays, isa="xla")


def _treelets(verts, idx, fan=8):
    v = np.asarray(verts, np.float32)
    i = np.asarray(idx)
    v0, v1, v2 = v[i[:, 0]], v[i[:, 1]], v[i[:, 2]]
    ts = build_treelet_scene(v0, v1, v2, np.arange(len(i)), fan=fan)
    return ts.to_device()


def test_pack_bf16_bounds_conservative(rng):
    """Directed rounding: packed lo <= lo and packed hi >= hi for any
    sign/magnitude mix, and inverted pad boxes stay inverted."""
    lo = np.concatenate([
        rng.normal(size=1000).astype(np.float32) * 100,
        np.array([0.0, -0.0, 1e-30, -1e-30, np.inf], np.float32)])
    hi = lo + np.abs(rng.normal(size=lo.shape).astype(np.float32))
    hi[-1] = -np.inf   # pad box: lo=+inf hi=-inf
    packed = pack_bf16_bounds(lo, hi)
    bits = packed.view(np.uint32)
    lo_q = (bits & 0xFFFF0000).view(np.float32)
    hi_q = (bits << 16).view(np.float32)
    assert (lo_q[:-1] <= lo[:-1]).all()
    assert (hi_q[:-1] >= hi[:-1]).all()
    # quantization error bounded by one bf16 ulp (relative ~2^-8)
    m = np.isfinite(lo[:-1]) & (np.abs(lo[:-1]) > 1e-20)
    assert (np.abs(lo_q[:-1][m] - lo[:-1][m])
            <= np.abs(lo[:-1][m]) * 2.0 ** -7 + 1e-30).all()
    assert lo_q[-1] == np.inf and hi_q[-1] == -np.inf


@pytest.mark.parametrize("ntri,nray,fan", [
    (40, 200, 4),          # single treelet
    (700, 300, 4),         # several treelets, one+ mids
    (2500, 500, 8),        # multiple mids, chunk-1 pairs exercised
])
def test_rowtrace_matches_xla(rng, ntri, nray, fan):
    verts, idx = random_triangles(rng, ntri, extent=5.0, size=1.2)
    org = rng.uniform(-8, 8, (nray, 3)).astype(np.float32)
    d = rng.normal(size=(nray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)

    ref = _ref_hits(verts, idx, rays)
    ts = _treelets(verts, idx, fan=fan)
    assert ts.num_treelets >= 1
    t, prim = intersect_rowtrace2(ts, rays, interpret=True)

    valid = np.asarray(prim) >= 0
    np.testing.assert_array_equal(valid, np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5)
    # prim ids may differ only where two prims tie on t
    pm = np.asarray(prim)[m] == np.asarray(ref.prim_id)[m]
    if not pm.all():
        tt = np.asarray(t)[m][~pm]
        rt = np.asarray(ref.t)[m][~pm]
        np.testing.assert_allclose(tt, rt, rtol=1e-5)


def test_rowtrace_sphere_inside_origins(rng):
    """Origins inside the mesh + many treelet crossings (the bench
    shape, scaled down)."""
    verts, idx = triangle_sphere((0, 0, 0), 2.0, 24)   # ~1.1k tris
    org = rng.uniform(-3, 3, (800, 3)).astype(np.float32)
    d = rng.normal(size=(800, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)

    ref = _ref_hits(verts, idx, rays)
    ts = _treelets(verts, idx, fan=4)
    t, prim = intersect_rowtrace2(ts, rays, interpret=True)

    np.testing.assert_array_equal(np.asarray(prim) >= 0,
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-5)


def test_rowtrace_occluded(rng):
    verts, idx = triangle_sphere((0, 0, 0), 2.0, 16)
    org = rng.uniform(-3, 3, (400, 3)).astype(np.float32)
    d = rng.normal(size=(400, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)

    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()
    ref = et.scene_occluded(cs, rays, isa="xla")

    ts = _treelets(verts, idx, fan=4)
    t, _ = intersect_rowtrace2(ts, rays, occluded=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(t) == -np.inf, np.asarray(ref))


def test_treelet_build_shapes(rng):
    verts, idx = random_triangles(rng, 1000, extent=4.0)
    v = np.asarray(verts, np.float32)
    i = np.asarray(idx)
    ts = build_treelet_scene(v[i[:, 0]], v[i[:, 1]], v[i[:, 2]],
                             np.arange(len(i)), fan=8)
    assert ts.blocks.shape[1:] == (BLOCK_ROWS, 128)
    assert ts.num_treelets == ts.num_mids * 8
    assert ts.num_treelets * P_CAP >= 1000
    # every real prim id appears exactly once in the leaf pid planes
    # (stored as int32 bit patterns inside the f32 block)
    pid_rows = [NODE_ROWS + ck * LEAF_FIELDS + f
                for ck in (0, 1) for f in (18, 19)]
    pids = np.concatenate(
        [ts.blocks[:, r, :].ravel() for r in pid_rows]).view(np.int32)
    pids = pids[pids >= 0].astype(np.int64)
    assert len(pids) == 1000
    assert len(np.unique(pids)) == 1000


def test_rowtrace_jit_and_grad(rng):
    """The round-3 contract (VERDICT r2 #1): rowtrace is reachable from
    jax.jit and jax.grad — the round loop is a lax.while_loop device
    program and traversal carries a zero-grad custom_vjp, with gradients
    flowing through the differentiable hit re-evaluation instead."""
    import jax
    import jax.numpy as jnp

    from embree_tpu.diff.hit import reeval_hit
    from embree_tpu.core.rayhit import Rays

    verts, idx = triangle_sphere((0, 0, 0), 2.0, 16)
    org = rng.uniform(-3, 3, (600, 3)).astype(np.float32)
    d = rng.normal(size=(600, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)
    ts = _treelets(verts, idx, fan=4)

    i = np.asarray(idx)

    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()

    def loss(vertices, r):
        tris = cs.tris._replace(v0=vertices[i[:, 0]], v1=vertices[i[:, 1]],
                                v2=vertices[i[:, 2]])
        flat = Rays(r.org.reshape(-1, 3), r.dir.reshape(-1, 3),
                    r.tnear.reshape(-1), r.tfar.reshape(-1))
        t, prim = intersect_rowtrace2(ts, flat, interpret=True)
        h = reeval_hit(tris, flat, jnp.maximum(prim, 0), prim >= 0)
        return jnp.sum(jnp.where(prim >= 0, h.t, 0.0)), prim

    (val, prim), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(
        jnp.asarray(verts), rays)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0      # grads actually flow
    # and the traced forward matches the eager reference
    ref = _ref_hits(verts, idx, rays)
    np.testing.assert_array_equal(np.asarray(prim) >= 0,
                                  np.asarray(ref.valid))


def test_rowtrace2_adversarial_no_truncation(rng):
    """VERDICT r4 #9: a cap-busting scene must complete with correct
    hits — no silent truncation. The kernel's in-loop caps are provably
    unreachable by construction (per treelet, each lane visits <= 85
    inner slots and <= 128 pairs per chunk, 2 retired per iteration,
    under caps of 48/68 iterations; mid/fan masks drain monotonically);
    this test drives the worst remaining axis — every ray forced
    through MANY (mid, treelet) serve units with tiny consensus groups
    — and gates on exact agreement with the XLA reference."""
    import jax.numpy as jnp
    from embree_tpu.core.rayhit import Rays

    # dense shell of overlapping triangles around the origin: rays from
    # outside through the center intersect candidate boxes of nearly
    # every treelet; fan=2 maximizes the mid count (many small groups)
    ntri = 3000
    verts, idx = random_triangles(rng, ntri, extent=1.5, size=0.9)
    ts = _treelets(verts, idx, fan=2)
    assert ts.num_mids >= 3

    nray = 512
    # all rays converge on the center from random directions: every
    # ray's mid mask is nearly full
    d = rng.normal(size=(nray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = -d * 6.0
    rays = Rays(jnp.asarray(org), jnp.asarray(d),
                jnp.zeros(nray), jnp.full(nray, np.inf))
    t, prim = intersect_rowtrace2(ts, rays, interpret=True)
    ref = _ref_hits(verts, idx, rays)
    np.testing.assert_array_equal(np.asarray(prim) >= 0,
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4, atol=1e-5)
    # occluded flavor under the same stress
    t2, _ = intersect_rowtrace2(ts, rays, occluded=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(t2) == -np.inf, m)


def test_rowtrace_beyond_256_mids(rng):
    """VERDICT r4 #4 (cap lift): scenes needing >8 mid-mask words (the
    old 256-mid ceiling) must traverse exactly. fan=1 maximizes the mid
    count; this build lands at ~300+ mids (mid_words ~ 10)."""
    verts, idx = triangle_sphere((0, 0, 0), 2.0, 200)   # ~80k tris
    v = np.asarray(verts, np.float32)
    i = np.asarray(idx)
    ts = build_treelet_scene(v[i[:, 0]], v[i[:, 1]], v[i[:, 2]],
                             np.arange(len(i)), fan=1).to_device()
    assert ts.num_mids > 256, ts.num_mids
    from embree_tpu.traverse.rowtrace2 import fits_rowtrace2
    assert fits_rowtrace2(ts.num_mids, ts.fan)

    nray = 192
    org = rng.uniform(-3, 3, (nray, 3)).astype(np.float32)
    d = rng.normal(size=(nray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)
    t, prim = intersect_rowtrace2(ts, rays, interpret=True)
    ref = _ref_hits(verts, idx, rays)
    np.testing.assert_array_equal(np.asarray(prim) >= 0,
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4, atol=1e-5)


def test_rowtrace_large_fan_rolled_pass(rng):
    """fan > 40 takes the ROLLED fan_pass (fori + per-lane gathers —
    the 128-wide static unroll was a remote-compile wall); exactness
    must hold on the rolled path."""
    verts, idx = triangle_sphere((0, 0, 0), 2.0, 100)   # ~20k tris
    v = np.asarray(verts, np.float32)
    i = np.asarray(idx)
    ts = build_treelet_scene(v[i[:, 0]], v[i[:, 1]], v[i[:, 2]],
                             np.arange(len(i)), fan=48).to_device()
    assert ts.fan > 40
    nray = 256
    org = rng.uniform(-3, 3, (nray, 3)).astype(np.float32)
    d = rng.normal(size=(nray, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)
    t, prim = intersect_rowtrace2(ts, rays, interpret=True)
    ref = _ref_hits(verts, idx, rays)
    np.testing.assert_array_equal(np.asarray(prim) >= 0,
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4, atol=1e-5)
