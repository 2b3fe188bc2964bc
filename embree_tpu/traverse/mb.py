"""Motion-blur accel + traversal (2-timestep linear motion).

Analog of the reference's MB stack (AlignedNodeMB nodes bvh.h:597, msmblur
builders, MB triangle intersectors): geometry stores begin/end vertex
positions, the BVH keeps per-node bounds for BOTH timesteps (built once
over union bounds, then refit against each timestep — the lbbox analog),
and traversal linearly interpolates node bounds and triangle vertices at
the ray's time. The reference supports N timesteps with 4D time splits;
two-timestep linear motion covers the tutorial/verify MB matrix
(motion_blur_geometry) and is the common production case.
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
from .packet import _finalize_hits


class MBAccel(NamedTuple):
    bvh: BVH               # structure + bounds at t=0
    lower1: jnp.ndarray    # (M, W, 3) bounds at t=1
    upper1: jnp.ndarray
    tris0: TrianglePrims
    tris1: TrianglePrims


@functools.partial(jax.jit, static_argnames=("stack_depth", "max_leaf"))
def intersect_mb(accel: MBAccel, rays: Rays, time,
                 stack_depth: int = 96, max_leaf: int = 8) -> Hits:
    """Closest hit at ray time in [0, 1]. `time` is (R,) or scalar."""
    bvh = accel.bvh
    org = rays.org.reshape(-1, 3)
    direction = rays.dir.reshape(-1, 3)
    tnear = rays.tnear.reshape(-1)
    tfar = rays.tfar.reshape(-1)
    R = tnear.shape[0]
    tm = jnp.asarray(time, jnp.float32)
    tm = jnp.broadcast_to(tm.reshape(-1) if tm.ndim > 1 else tm, (R,))

    rdir = rcp_safe(direction)
    org_rdir = org * rdir

    tmin_time = jnp.min(tm)
    tmax_time = jnp.max(tm)

    def node_test(node, tcur):
        # conservative per-packet interpolated bounds: the packet shares
        # one stack, so use the union over the packet's time range
        lo0, hi0 = bvh.lower[node], bvh.upper[node]
        lo1, hi1 = accel.lower1[node], accel.upper1[node]
        lo = jnp.minimum(lo0 * (1 - tmin_time) + lo1 * tmin_time,
                         lo0 * (1 - tmax_time) + lo1 * tmax_time)
        hi = jnp.maximum(hi0 * (1 - tmin_time) + hi1 * tmin_time,
                         hi0 * (1 - tmax_time) + hi1 * tmax_time)
        t_lo = lo[:, None, :] * rdir[None] - org_rdir[None]
        t_hi = hi[:, None, :] * rdir[None] - org_rdir[None]
        tmin = ROBUST_MIN_RCP * jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
        tmax = ROBUST_MAX_RCP * jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
        tmin = jnp.maximum(tmin, tnear[None])
        return tmin, (tmin <= tmax) & (tmin <= tcur[None])

    def leaf(start, count, t, prim):
        def body(i, carry):
            t, prim = carry
            p = bvh.prim_order[start + i]
            w = tm[..., None]
            v0 = accel.tris0.v0[p] * (1 - w) + accel.tris1.v0[p] * w
            v1 = accel.tris0.v1[p] * (1 - w) + accel.tris1.v1[p] * w
            v2 = accel.tris0.v2[p] * (1 - w) + accel.tris1.v2[p] * w
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

    # finalize against time-interpolated triangles
    w = tm[..., None]
    p = jnp.maximum(prim, 0)
    tris_t = TrianglePrims(
        v0=accel.tris0.v0[p] * (1 - w) + accel.tris1.v0[p] * w,
        v1=accel.tris0.v1[p] * (1 - w) + accel.tris1.v1[p] * w,
        v2=accel.tris0.v2[p] * (1 - w) + accel.tris1.v2[p] * w,
        geom_id=accel.tris0.geom_id[p],
        prim_id=accel.tris0.prim_id[p],
        uv_flip=accel.tris0.uv_flip[p])
    flat = Rays(org, direction, tnear, tfar)
    # tris_t is already gathered per-ray; build a per-ray finalize
    valid = prim >= 0
    ok, _t2, u, v, ng = intersect_triangle(
        org, direction, tnear, t * (1.0 + 1e-6) + 1e-30,
        tris_t.v0, tris_t.v1, tris_t.v2)
    shape = rays.batch_shape
    return Hits(
        t=jnp.where(valid, t, tfar).reshape(shape),
        u=jnp.where(valid, u, 0.0).reshape(shape),
        v=jnp.where(valid, v, 0.0).reshape(shape),
        ng=jnp.where(valid[..., None], ng, 0.0).reshape(shape + (3,)),
        prim_id=jnp.where(valid, tris_t.prim_id, -1).reshape(shape),
        geom_id=jnp.where(valid, tris_t.geom_id, -1).reshape(shape),
        gprim=jnp.where(valid, p, -1).reshape(shape),
        inst_id=jnp.full(shape, -1, jnp.int32),
    )
