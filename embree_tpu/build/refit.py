"""Bottom-up BVH refit (RTC_BUILD_QUALITY_REFIT).

Analog of kernels/bvh/bvh_refit.{h,cpp}: keep the tree structure from a
previous build and only recompute node bounds from moved primitives. The
reference walks the tree recursively; here refit is a REFIT SCHEDULE
(per-depth level order, computed once from the structure on the host)
replayed as per-level segment reductions in jnp — runs on device inside
jit, so deforming meshes update every frame without host work.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .bvh import BVH


class RefitSchedule(NamedTuple):
    """Structure-dependent, geometry-independent refit plan."""

    level_nodes: tuple          # tuple of (K,) i32 arrays, deepest first
    max_leaf: int


def plan_refit(bvh: BVH) -> RefitSchedule:
    """Compute per-depth node order (host, once per structure)."""
    child = np.asarray(bvh.child)
    count = np.asarray(bvh.count)
    M = child.shape[0]
    depth = np.full(M, -1, np.int64)
    depth[0] = 0
    stack = [0]
    maxd = 0
    while stack:
        n = stack.pop()
        for c in range(child.shape[1]):
            if count[n, c] == 0:
                depth[child[n, c]] = depth[n] + 1
                maxd = max(maxd, depth[n] + 1)
                stack.append(int(child[n, c]))
    levels = tuple(jnp.asarray(np.nonzero(depth == d)[0].astype(np.int32))
                   for d in range(maxd, -1, -1))
    max_leaf = int(np.asarray(bvh.count).max(initial=1))
    return RefitSchedule(level_nodes=levels, max_leaf=max(max_leaf, 1))


def refit(bvh: BVH, schedule: RefitSchedule, prim_lower, prim_upper) -> BVH:
    """Recompute all node bounds for moved prims (jittable)."""
    max_leaf = schedule.max_leaf
    P = bvh.prim_order.shape[0]

    # leaf bounds: for each (node, slot) leaf, reduce its prim range.
    # ranges are contiguous in prim_order; gather up to max_leaf prims.
    plo = prim_lower[bvh.prim_order]
    phi = prim_upper[bvh.prim_order]

    lower, upper = bvh.lower, bvh.upper

    def leaf_bounds(start, cnt):
        idx = start[..., None] + jnp.arange(max_leaf)
        valid = jnp.arange(max_leaf) < cnt[..., None]
        idx = jnp.clip(idx, 0, max(P - 1, 0))
        lo = jnp.where(valid[..., None], plo[idx], jnp.inf).min(axis=-2)
        hi = jnp.where(valid[..., None], phi[idx], -jnp.inf).max(axis=-2)
        return lo, hi

    # all leaf slots at once
    is_leaf = bvh.count > 0
    llo, lhi = leaf_bounds(bvh.child, bvh.count)
    lower = jnp.where(is_leaf[..., None], llo, lower)
    upper = jnp.where(is_leaf[..., None], lhi, upper)

    # bottom-up: per level, each inner slot's bounds = union of its child
    # node's slot bounds
    for nodes in schedule.level_nodes:
        ch = bvh.child[nodes]          # (K, W)
        cn = bvh.count[nodes]
        inner = cn == 0
        clo = jnp.min(jnp.where((bvh.count[ch] >= 0)[..., None],
                                lower[ch], jnp.inf), axis=2)  # (K, W, 3)
        chi = jnp.max(jnp.where((bvh.count[ch] >= 0)[..., None],
                                upper[ch], -jnp.inf), axis=2)
        lower = lower.at[nodes].set(
            jnp.where(inner[..., None], clo, lower[nodes]))
        upper = upper.at[nodes].set(
            jnp.where(inner[..., None], chi, upper[nodes]))

    return BVH(lower=lower, upper=upper, child=bvh.child, count=bvh.count,
               prim_order=bvh.prim_order)
