"""Pluecker watertight intersector tests (triangle_intersector_pluecker.h)."""
import jax.numpy as jnp
import numpy as np

from embree_tpu.traverse.moeller import (intersect_triangle,
                                         intersect_triangle_pluecker)


def test_matches_moeller_interior(rng):
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    n = 5000
    org = np.concatenate([rng.uniform(0.01, 0.45, (n, 2)),
                          np.full((n, 1), 3.0)], 1).astype(np.float32)
    d = np.tile(np.array([0, 0, -1.0], np.float32), (n, 1))
    tn = jnp.zeros(n)
    tf = jnp.full(n, jnp.inf)
    okm, tm, um, vm, ngm = intersect_triangle(org, d, tn, tf, v0, v1, v2)
    okp, tp, up, vp, ngp = intersect_triangle_pluecker(org, d, tn, tf,
                                                       v0, v1, v2)
    np.testing.assert_array_equal(np.asarray(okm), np.asarray(okp))
    m = np.asarray(okm)
    np.testing.assert_allclose(np.asarray(tp)[m], np.asarray(tm)[m], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(up)[m], np.asarray(um)[m], atol=1e-5)
    assert float(jnp.sum(ngm * ngp)) > 0  # consistent orientation


def test_shared_edge_watertight(rng):
    """Rays exactly on a shared edge must hit at least one triangle."""
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    v3 = jnp.asarray([1.0, 1.0, 0.0])
    n = 20000
    t = rng.uniform(0, 1, n).astype(np.float32)
    pts = np.asarray(v1)[None] * t[:, None] + np.asarray(v2)[None] * (1 - t[:, None])
    org = np.concatenate([pts[:, :2], np.full((n, 1), 5.0)], 1).astype(np.float32)
    d = np.tile(np.array([0, 0, -1.0], np.float32), (n, 1))
    tn = jnp.zeros(n)
    tf = jnp.full(n, jnp.inf)
    hA, *_ = intersect_triangle_pluecker(org, d, tn, tf, v0, v1, v2)
    hB, *_ = intersect_triangle_pluecker(org, d, tn, tf, v3, v2, v1)
    cnt = np.asarray(hA).astype(int) + np.asarray(hB).astype(int)
    assert (cnt == 0).mean() == 0.0, "edge miss -> not watertight"
