"""Multi-segment motion-blur accel + traversal (N-timestep piecewise-
linear motion).

Analog of the reference's MB stack (AlignedNodeMB bvh.h:597,
AlignedNodeMB4D :837, bvh_builder_msmblur.h:587 multi-segment builder,
MB triangle intersectors): geometry stores N >= 2 vertex timesteps, the
BVH keeps per-node PER-TIMESTEP refit bounds (the lbbox-per-segment
analog — each uniform segment gets exact linear bounds, which is what
the reference's temporal splits buy for its non-uniform segments), and
traversal interpolates node bounds and triangle vertices at the ray's
time within its segment.

Node tests are conservative over the ray batch's whole time range
(union of the timestep knot boxes the range touches); leaf tests gather
the per-ray segment's two knot meshes and lerp exactly.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..build.bvh import BVH
from ..core.math import rcp_safe, ROBUST_MAX_RCP, ROBUST_MIN_RCP
from ..core.rayhit import Hits, Rays
from ..scene.prims import TrianglePrims
from .moeller import intersect_triangle


class MBAccel(NamedTuple):
    bvh: BVH                 # structure (bounds field = timestep 0)
    lower_ts: jnp.ndarray    # (S, M, W, 3) per-timestep refit bounds
    upper_ts: jnp.ndarray
    v0_ts: jnp.ndarray       # (S, T, 3) triangle verts per timestep
    v1_ts: jnp.ndarray
    v2_ts: jnp.ndarray
    geom_id: jnp.ndarray     # (T,)
    prim_id: jnp.ndarray
    uv_flip: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.lower_ts.shape[0]


def _seg_weights(tm, S):
    """time in [0,1] -> (segment index, local weight) over S-1 uniform
    segments."""
    x = jnp.clip(tm, 0.0, 1.0) * (S - 1)
    seg = jnp.clip(x.astype(jnp.int32), 0, S - 2)
    return seg, x - seg


@functools.partial(jax.jit, static_argnames=("stack_depth", "max_leaf"))
def intersect_mb(accel: MBAccel, rays: Rays, time,
                 stack_depth: int = 96, max_leaf: int = 8) -> Hits:
    """Closest hit at ray time in [0, 1]. `time` is (R,) or scalar."""
    bvh = accel.bvh
    S = accel.num_timesteps
    org = rays.org.reshape(-1, 3)
    direction = rays.dir.reshape(-1, 3)
    tnear = rays.tnear.reshape(-1)
    tfar = rays.tfar.reshape(-1)
    R = tnear.shape[0]
    tm = jnp.asarray(time, jnp.float32)
    tm = jnp.broadcast_to(tm.reshape(-1) if tm.ndim > 1 else tm, (R,))
    seg, w = _seg_weights(tm, S)

    rdir = rcp_safe(direction)
    org_rdir = org * rdir

    tmin_time = jnp.min(tm)
    tmax_time = jnp.max(tm)

    def node_test(node, tcur):
        # conservative: union of every timestep knot box whose knot
        # interval intersects the batch's time range (the batch shares
        # one stack) — exact per-segment bounds via the refit knots
        lo = jnp.full((bvh.width, 3), jnp.inf)
        hi = jnp.full((bvh.width, 3), -jnp.inf)
        for s in range(S):
            k0 = (s - 1) / (S - 1)
            k1 = (s + 1) / (S - 1)
            act = (k1 >= tmin_time) & (k0 <= tmax_time)
            lo = jnp.where(act, jnp.minimum(lo, accel.lower_ts[s, node]),
                           lo)
            hi = jnp.where(act, jnp.maximum(hi, accel.upper_ts[s, node]),
                           hi)
        t_lo = lo[:, None, :] * rdir[None] - org_rdir[None]
        t_hi = hi[:, None, :] * rdir[None] - org_rdir[None]
        tmin = ROBUST_MIN_RCP * jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
        tmax = ROBUST_MAX_RCP * jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
        tmin = jnp.maximum(tmin, tnear[None])
        return tmin, (tmin <= tmax) & (tmin <= tcur[None])

    def lerp_tri(p):
        w_ = w[..., None]
        v0 = (accel.v0_ts[seg, p] * (1 - w_)
              + accel.v0_ts[seg + 1, p] * w_)
        v1 = (accel.v1_ts[seg, p] * (1 - w_)
              + accel.v1_ts[seg + 1, p] * w_)
        v2 = (accel.v2_ts[seg, p] * (1 - w_)
              + accel.v2_ts[seg + 1, p] * w_)
        return v0, v1, v2

    def leaf(start, count, t, prim):
        def body(i, carry):
            t, prim = carry
            p = bvh.prim_order[start + i]
            v0, v1, v2 = lerp_tri(p)
            ok, th, _u, _v, _ng = intersect_triangle(
                org, direction, tnear, t, v0, v1, v2)
            ok = ok & (i < count)
            return jnp.where(ok, th, t), jnp.where(ok, p, prim)

        return jax.lax.fori_loop(0, jnp.minimum(count, max_leaf), body,
                                 (t, prim))

    def cond(c):
        return c[0] > 0

    def step(c):
        sp, stack, t, prim = c
        sp = sp - 1
        node = stack[sp]
        child, count = bvh.child[node], bvh.count[node]
        tmin, hit = node_test(node, t)
        any_hit = jnp.any(hit, axis=1) & (count >= 0)
        for cc in range(bvh.width):
            def run(a, cc=cc):
                return leaf(child[cc], count[cc], *a)
            t, prim = jax.lax.cond(any_hit[cc] & (count[cc] > 0), run,
                                   lambda a: a, (t, prim))
        for cc in range(bvh.width):
            push = any_hit[cc] & (count[cc] == 0)
            stack = jnp.where(push, stack.at[sp].set(child[cc]), stack)
            sp = sp + push.astype(jnp.int32)
        return sp, stack, t, prim

    init = (jnp.int32(1), jnp.zeros((stack_depth,), jnp.int32), tfar,
            jnp.full((R,), -1, jnp.int32))
    _sp, _stack, t, prim = jax.lax.while_loop(cond, step, init)
    return _finalize_mb(accel, rays, t, prim, tm)


def _finalize_mb(accel: MBAccel, rays: Rays, t, prim, tm) -> Hits:
    """Finalize (t, winning prim) against time-interpolated triangles —
    shared by the XLA and Pallas MB traversals."""
    S = accel.num_timesteps
    org = rays.org.reshape(-1, 3)
    direction = rays.dir.reshape(-1, 3)
    tnear = rays.tnear.reshape(-1)
    tfar = rays.tfar.reshape(-1)
    seg, w = _seg_weights(tm, S)
    p = jnp.maximum(prim, 0)
    w_ = w[..., None]
    v0 = accel.v0_ts[seg, p] * (1 - w_) + accel.v0_ts[seg + 1, p] * w_
    v1 = accel.v1_ts[seg, p] * (1 - w_) + accel.v1_ts[seg + 1, p] * w_
    v2 = accel.v2_ts[seg, p] * (1 - w_) + accel.v2_ts[seg + 1, p] * w_
    valid = prim >= 0
    ok, _t2, u, v, ng = intersect_triangle(
        org, direction, tnear, t * (1.0 + 1e-6) + 1e-30, v0, v1, v2)
    shape = rays.batch_shape
    return Hits(
        t=jnp.where(valid, t, tfar).reshape(shape),
        u=jnp.where(valid, u, 0.0).reshape(shape),
        v=jnp.where(valid, v, 0.0).reshape(shape),
        ng=jnp.where(valid[..., None], ng, 0.0).reshape(shape + (3,)),
        prim_id=jnp.where(valid, accel.prim_id[p], -1).reshape(shape),
        geom_id=jnp.where(valid, accel.geom_id[p], -1).reshape(shape),
        gprim=jnp.where(valid, p, -1).reshape(shape),
        inst_id=jnp.full(shape, -1, jnp.int32),
    )
