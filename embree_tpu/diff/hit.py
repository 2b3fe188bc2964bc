"""Differentiable hit evaluation.

The differentiable-rendering core (SURVEY.md §7.6, BASELINE.json north
star): BVH build and hit *selection* are discrete and wrapped in
stop_gradient; the hit point itself is then re-evaluated analytically
from the winning primitive so gradients flow from pixels to vertex
positions (and later: displacement maps and materials) — the reference's
`rtcInterpolate` derivative machinery (rtcore_geometry.h:234-338) defines
which derivatives exist (P, dPdu, dPdv); here they come for free from
jax.grad through the re-evaluation.

Usage: `tris` must be built from the differentiable vertex arrays (the
same jnp arrays the loss differentiates), while the BVH can be stale /
stop-gradient — exactly embree's REFIT-vs-rebuild split.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import cross, dot
from ..core.rayhit import Hits, Rays
from ..scene.prims import TrianglePrims
from ..scene.scene import CommittedScene, scene_intersect


@jax.custom_vjp
def _gather_rows(table, idx):
    return table[idx]


def _gather_rows_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _gather_rows_bwd(res, ct):
    # XLA's native gather-VJP is an unsorted scatter-add — measured
    # 362 ms for 1M rows -> 500k on the v5e. Sorting the cotangent
    # COLUMNS along with the index in ONE variadic lax.sort (payload
    # sort, not argsort+take: 1M-row takes cost ~13 ms each on this
    # chip while a keyed payload sort is ~7 ms total) and summing with
    # indices_are_sorted=True makes the reduction sequential traffic.
    # This column-split form requires the (rows, cols) gather shape the
    # forward produces from 1-D idx.
    assert ct.ndim == 2, (
        "_gather_rows backward expects a rank-2 cotangent (1-D row "
        f"indices in the forward); got ct.ndim={ct.ndim}. Reshape idx "
        "to 1-D before calling _gather_rows.")
    idx, T = res
    ops = (idx,) + tuple(ct[:, j] for j in range(ct.shape[1]))
    s = jax.lax.sort(ops, num_keys=1)
    g = jax.ops.segment_sum(jnp.stack(s[1:], axis=-1), s[0],
                            num_segments=T, indices_are_sorted=True)
    return g, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def reeval_hit(tris: TrianglePrims, rays: Rays, gprim, valid) -> Hits:
    """Recompute (t, u, v, Ng, P) differentiably for the selected prim."""
    p = jnp.maximum(gprim, 0)
    # one packed gather instead of three (v5e gather cost is per-op);
    # grads flow back through the concat as cheap slices
    packf = jnp.concatenate([tris.v0, tris.v1, tris.v2], axis=-1)  # (T, 9)
    g = _gather_rows(packf, p)
    v0, v1, v2 = g[..., 0:3], g[..., 3:6], g[..., 6:9]
    e1 = v1 - v0
    e2 = v2 - v0
    ng = cross(e1, e2)  # == reference Ng = cross(e2', e1') with their edges
    # solve ray/plane: t = dot(v0 - org, ng) / dot(dir, ng)
    den = dot(rays.dir, ng)
    den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
    t = dot(v0 - rays.org, ng) / den_safe
    pt = rays.org + t[..., None] * rays.dir
    # barycentrics via projection onto the dominant-normal plane-free form
    w = pt - v0
    d00 = dot(e1, e1); d01 = dot(e1, e2); d11 = dot(e2, e2)
    d20 = dot(w, e1); d21 = dot(w, e2)
    denom = d00 * d11 - d01 * d01
    denom_safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
    u = (d11 * d20 - d01 * d21) / denom_safe
    v = (d00 * d21 - d01 * d20) / denom_safe
    packi = jnp.stack([tris.uv_flip, tris.prim_id, tris.geom_id],
                      axis=-1)  # (T, 3) — one meta gather instead of three
    meta = packi[p]
    flip = meta[..., 0] == 1
    u = jnp.where(flip, 1.0 - u, u)
    v = jnp.where(flip, 1.0 - v, v)
    z = jnp.zeros_like(t)
    return Hits(
        t=jnp.where(valid, t, rays.tfar),
        u=jnp.where(valid, u, z),
        v=jnp.where(valid, v, z),
        ng=jnp.where(valid[..., None], ng, 0.0),
        prim_id=jnp.where(valid, meta[..., 1], -1),
        geom_id=jnp.where(valid, meta[..., 2], -1),
        gprim=jnp.where(valid, gprim, -1),
        inst_id=jnp.full(t.shape, -1, jnp.int32),
    )


def reeval_hit_verts(vertices, tri_idx, rays: Rays, gprim, valid):
    """Like reeval_hit but differentiates w.r.t. the VERTEX table
    directly: gathers the winning primitive's three corners from
    `vertices` in ONE composed gather (rays -> corner vertex ids via the
    static connectivity `tri_idx`) instead of materializing a full
    differentiable per-triangle copy of the scene first. Identical loss
    semantics; the backward pass is one sorted segment-sum (3R -> V)
    instead of a rays->prims segment-sum chained into three prims->verts
    scatter-adds. Returns (t, u, v) only — the training-loss surface.

    Reference analog: rtcInterpolate's vertex-buffer derivative path
    (rtcore_geometry.h:234-338) — gradients exist w.r.t. the vertex
    buffer, not a per-primitive copy.

    CONSTRAINT: `gprim` indexes `tri_idx` directly, so this is only
    correct for a SINGLE triangle-mesh geometry whose committed prim
    order equals the input connectivity order (no quad split, no
    multi-geometry remap, no uv_flip) — true for bench.py's sphere.
    For general scenes use reeval_hit, which goes through the
    committed per-prim tables (uv_flip included)."""
    p = jnp.maximum(gprim, 0)
    vidx = jnp.take(tri_idx, p, axis=0)              # (R, 3) int — discrete
    vidx = jax.lax.stop_gradient(vidx)
    g = _gather_rows(vertices, vidx.reshape(-1))     # (3R, 3)
    g = g.reshape(p.shape + (3, 3))
    v0, v1, v2 = g[..., 0, :], g[..., 1, :], g[..., 2, :]
    e1 = v1 - v0
    e2 = v2 - v0
    ng = cross(e1, e2)
    den = dot(rays.dir, ng)
    den_safe = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
    t = dot(v0 - rays.org, ng) / den_safe
    pt = rays.org + t[..., None] * rays.dir
    w = pt - v0
    d00 = dot(e1, e1); d01 = dot(e1, e2); d11 = dot(e2, e2)
    d20 = dot(w, e1); d21 = dot(w, e2)
    denom = d00 * d11 - d01 * d01
    denom_safe = jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
    u = (d11 * d20 - d01 * d21) / denom_safe
    v = (d00 * d21 - d01 * d20) / denom_safe
    z = jnp.zeros_like(t)
    return (jnp.where(valid, t, rays.tfar),
            jnp.where(valid, u, z), jnp.where(valid, v, z))


def intersect_diff(cs: CommittedScene, rays: Rays, isa: str = "default") -> Hits:
    """Closest-hit with gradients: discrete traversal under stop_gradient,
    differentiable analytic re-evaluation on the selected primitive."""
    sel = scene_intersect(jax.lax.stop_gradient(cs),
                          jax.lax.stop_gradient(rays), isa=isa)
    return reeval_hit(cs.tris, rays, sel.gprim, sel.valid)
