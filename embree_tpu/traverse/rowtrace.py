"""Per-lane treelet traversal ("rowtrace") — the incoherent-ray fast path.

Replaces shared-stack packet traversal for large triangle scenes: every
ray owns a vector-register BVH4 stack and walks its own path through a
VMEM-staged treelet (build/treelets.py), so no work is spent testing
nodes against rays that do not want them (the shared-stack kernel's
~500x redundancy at 1M prims). The reference analog is single-ray
traversal (bvh_intersector1.cpp:41-127) — re-expressed so that 1024 rays
per (8,128)-tile traverse in lockstep with per-lane data:

  * node fetch: `jnp.take_along_axis` on (8,128) registers — Mosaic's
    tpu.dynamic_gather — from the treelet block staged per sublane-row
    (each row of 128 rays works one treelet; rows are grouped by a
    per-round sort).
  * per-lane stack: 12 loop-carried (8,128) i32 tiles (the exact bound:
    <= 3 pushes x 4 implicit levels), pushed/popped with one-hot selects.
  * the same kernel then runs the "fan scan" — brute slab tests of the
    row's mid's FAN treelet boxes — to pick each lane's next treelet
    beyond its (entry, id) lexicographic cursor (iterative deepening:
    one treelet per ray per round, nearest-first, so closest-hit rays
    terminate as soon as the next entry exceeds their best t).

The round loop (intersect_rowtrace) is FULLY JITTED: a lax.while_loop
whose body runs (kernel round -> mid scan -> grouping sort) on a
bucketed active-prefix (lax.switch over static prefix sizes — finished
rays compact to the back and stay there, so each round only touches the
front of the state). No host syncs: the whole traversal is one device
program, traceable under jax.jit / shard_map, and carries a zero-grad
custom_vjp (hit *selection* is discrete — gradients flow through the
differentiable re-evaluation in diff/hit.py, never the traversal).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..build.treelets import F_FIELDS, L3_BASE, N_INNER, TreeletScene
from ..core.rayhit import Rays

ROBUST_MIN = np.float32(1.0 - 3.0 * 2.0 ** -23)
ROBUST_MAX = np.float32(1.0 + 3.0 * 2.0 ** -23)
INF = np.float32(np.inf)
NINF = np.float32(-np.inf)
D_STACK = 12          # exact: 3 pushes x 4 implicit levels
LEAF_BASE = 128       # leaf-pair slot ids start here (chunk 1)


def _rcp_safe(a):
    return jnp.where(jnp.abs(a) < 1e-30,
                     jnp.where(a < 0, -1e30, 1e30), 1.0 / a)


def _slab(lox, loy, loz, hix, hiy, hiz, rdx, rdy, rdz, orx, ory, orz, tn):
    tx0 = lox * rdx - orx
    tx1 = hix * rdx - orx
    ty0 = loy * rdy - ory
    ty1 = hiy * rdy - ory
    tz0 = loz * rdz - orz
    tz1 = hiz * rdz - orz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                   jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1)) * ROBUST_MIN
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                   jnp.maximum(ty0, ty1)),
                       jnp.maximum(tz0, tz1)) * ROBUST_MAX
    # inverted/empty boxes (pads: lo=+inf, hi=-inf) must MISS — without
    # this, inf*rdir arithmetic can yield tmin<=tmax and every padded
    # child/treelet slot becomes a phantom candidate (a whole wasted
    # round per pad treelet). One axis check suffices: pads invert all.
    tmax = jnp.where(lox <= hix, tmax, NINF)
    return jnp.maximum(tmin, tn), tmax


def _rowtrace_kernel(fan: int, occluded: bool, cull: bool = False):
    """One grid step = one (8,128)-ray tile; per sublane-row: one staged
    treelet (traversal) + one staged mid fan (next-candidate scan)."""

    def kernel(tidp, midp, params, blocks, tre,
               ox, oy, oz, dx, dy, dz, tn,
               t_in, prim_in, cb_in, ce_in, tb_in, te_in,
               runt_in, runs_in,
               t_o, prim_o, cb_o, ce_o, tb_o, te_o, hasc_o,
               stage, midstage, sem1, sem2):
        pid = pl.program_id(0)
        for r in range(8):
            pltpu.make_async_copy(blocks.at[tidp[pid * 8 + r]],
                                  stage.at[r], sem1.at[r]).start()
            pltpu.make_async_copy(tre.at[midp[pid * 8 + r]],
                                  midstage.at[r], sem2.at[r]).start()

        max_iters = params[0]
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        rdx = _rcp_safe(d_x)
        rdy = _rcp_safe(d_y)
        rdz = _rcp_safe(d_z)
        orx = o_x * rdx
        ory = o_y * rdy
        orz = o_z * rdz
        tnear = tn[:]
        run_trav = runt_in[:] != 0
        run_scan = runs_in[:] != 0

        for r in range(8):
            pltpu.make_async_copy(blocks.at[tidp[pid * 8 + r]],
                                  stage.at[r], sem1.at[r]).wait()
            pltpu.make_async_copy(tre.at[midp[pid * 8 + r]],
                                  midstage.at[r], sem2.at[r]).wait()

        def fetch(cur):
            """Per-lane fetch of all F_FIELDS slot fields (chunk 0 =
            inner nodes, chunk 1 = leaf pairs)."""
            is_leaf = cur >= LEAF_BASE
            lane = jnp.bitwise_and(jnp.maximum(cur, 0), 127)
            vals = []
            for f in range(F_FIELDS):
                c0 = stage[:, 2 * f, :]
                c1 = stage[:, 2 * f + 1, :]
                g0 = jnp.take_along_axis(c0, lane, axis=1)
                g1 = jnp.take_along_axis(c1, lane, axis=1)
                vals.append(jnp.where(is_leaf, g1, g0))
            return vals

        zero_i = jnp.zeros_like(t_in[:], jnp.int32)

        def step(carry):
            cur, sp, t, prim, alive_i, iters = carry[:6]
            stack = list(carry[6:])
            alive = alive_i != 0
            vals = fetch(cur)
            is_leaf = cur >= LEAF_BASE

            # ---- node path: 4 implicit children ----
            keys, cids = [], []
            is_l3 = cur >= L3_BASE
            base = jnp.where(is_l3, LEAF_BASE + 2 * (cur - L3_BASE),
                             4 * cur + 1)
            for c in range(4):
                tmin, tmax = _slab(vals[c], vals[4 + c], vals[8 + c],
                                   vals[12 + c], vals[16 + c], vals[20 + c],
                                   rdx, rdy, rdz, orx, ory, orz, tnear)
                hit = (tmin <= tmax) & (tmin <= t)
                keys.append(jnp.where(hit, tmin, INF))
                cids.append(base + c)
            for (a, b) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                swap = keys[b] < keys[a]
                keys[a], keys[b] = (jnp.where(swap, keys[b], keys[a]),
                                    jnp.where(swap, keys[a], keys[b]))
                cids[a], cids[b] = (jnp.where(swap, cids[b], cids[a]),
                                    jnp.where(swap, cids[a], cids[b]))
            node_mode = alive & ~is_leaf
            near_hit = node_mode & (keys[0] < INF)
            # push far children (reverse order: nearest pops first)
            for k in (3, 2, 1):
                do = node_mode & (keys[k] < INF)
                for d in range(D_STACK):
                    stack[d] = jnp.where(do & (sp == d), cids[k], stack[d])
                sp = sp + do.astype(jnp.int32)

            # ---- leaf path: two inline Moeller triangles ----
            leaf_mode = alive & is_leaf
            for p in (0, 12):
                v0x, v0y, v0z = vals[p], vals[p + 1], vals[p + 2]
                e1x, e1y, e1z = vals[p + 3], vals[p + 4], vals[p + 5]
                e2x, e2y, e2z = vals[p + 6], vals[p + 7], vals[p + 8]
                ngx, ngy, ngz = vals[p + 9], vals[p + 10], vals[p + 11]
                # pid planes carry int32 ids bitcast into the f32 block
                # (exact for any prim count — f32 VALUES would corrupt
                # ids above 2^24); gathers/selects only move bits.
                pid_i = jax.lax.bitcast_convert_type(
                    vals[24 + (p // 12)], jnp.int32)
                cx = v0x - o_x
                cy = v0y - o_y
                cz = v0z - o_z
                rx = cy * d_z - cz * d_y
                ry = cz * d_x - cx * d_z
                rz = cx * d_y - cy * d_x
                den = ngx * d_x + ngy * d_y + ngz * d_z
                absden = jnp.abs(den)
                sgn = jnp.where(den >= 0.0, 1.0, -1.0)
                u_s = (rx * e2x + ry * e2y + rz * e2z) * sgn
                v_s = (rx * e1x + ry * e1y + rz * e1z) * sgn
                t_s = (ngx * cx + ngy * cy + ngz * cz) * sgn
                front = (den < 0.0) if cull else (den != 0.0)
                ok = leaf_mode & front & (u_s >= 0.0) & (v_s >= 0.0) \
                    & (u_s + v_s <= absden) & (absden * tnear < t_s) \
                    & (t_s <= absden * t)
                if occluded:
                    t = jnp.where(ok, NINF, t)
                else:
                    t = jnp.where(ok, t_s / jnp.maximum(absden, 1e-37), t)
                    prim = jnp.where(ok, pid_i, prim)
            if occluded:
                alive = alive & (t > NINF)

            # ---- advance: near child or pop ----
            need_pop = alive & (is_leaf | ~near_hit)
            can_pop = need_pop & (sp > 0)
            spm = sp - can_pop.astype(jnp.int32)
            popv = zero_i
            for d in range(D_STACK):
                popv = jnp.where(spm == d, stack[d], popv)
            cur = jnp.where(can_pop, popv,
                            jnp.where(near_hit & ~need_pop, cids[0], cur))
            sp = spm
            alive = alive & (~need_pop | can_pop)
            return tuple([cur, sp, t, prim, alive.astype(jnp.int32),
                          iters + 1] + stack)

        def cond(carry):
            alive_i, iters = carry[4], carry[5]
            return jnp.any(alive_i != 0) & (iters < max_iters)

        init = tuple([jnp.where(run_trav, 0, -1).astype(jnp.int32), zero_i,
                      t_in[:], prim_in[:], run_trav.astype(jnp.int32),
                      jnp.int32(0)]
                     + [zero_i] * D_STACK)
        out = jax.lax.while_loop(cond, step, init)
        t, prim = out[2], out[3]

        # cursor advance for traversed lanes
        te = jnp.where(run_trav, ce_in[:], te_in[:])
        tb = jnp.where(run_trav, cb_in[:], tb_in[:])

        # ---- fan scan: next candidate treelet beyond (te, tb) ----
        best_e = jnp.full_like(t, INF)
        best_b = jnp.full_like(tb, -1)
        for b in range(fan):
            pl_ = [jnp.broadcast_to(midstage[:, p, b:b + 1], t.shape)
                   for p in range(6)]
            tmin, tmax = _slab(pl_[0], pl_[1], pl_[2], pl_[3], pl_[4], pl_[5],
                               rdx, rdy, rdz, orx, ory, orz, tnear)
            ok = (tmin <= tmax) & (tmin <= t) \
                & ((tmin > te) | ((tmin == te) & (b > tb)))
            upd = ok & (tmin < best_e)
            best_e = jnp.where(upd, tmin, best_e)
            best_b = jnp.where(upd, b, best_b)

        scan_m = run_scan & (run_trav | (cb_in[:] < 0))
        t_o[:] = t
        prim_o[:] = prim
        ce_o[:] = jnp.where(scan_m, best_e, ce_in[:])
        cb_o[:] = jnp.where(scan_m, best_b, cb_in[:])
        te_o[:] = te
        tb_o[:] = tb
        # has-candidate after this round: scanned lanes -> found one?;
        # unscanned traversed lanes impossible (trav => scan); others keep
        hasc_o[:] = jnp.where(scan_m, (best_b >= 0).astype(jnp.int32),
                              (cb_in[:] >= 0).astype(jnp.int32))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("fan", "ntiles", "occluded", "cull",
                                    "interpret"))
def _run_rowtrace(ts_blocks, ts_tre, tidp, midp, tiles, fan: int,
                  ntiles: int, occluded: bool, cull: bool, interpret: bool):
    params = jnp.asarray([4096], jnp.int32)
    tile = (8, 128)
    ray_spec = pl.BlockSpec(tile, lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)]
        + [ray_spec] * 15,
        out_specs=tuple([ray_spec] * 7),
        scratch_shapes=[
            pltpu.VMEM((8, 2 * F_FIELDS, 128), jnp.float32),
            pltpu.VMEM((8, 6, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((8,)),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((ntiles * 8, 128), dt)
        for dt in (jnp.float32, jnp.int32, jnp.int32, jnp.float32,
                   jnp.int32, jnp.float32, jnp.int32))
    return pl.pallas_call(
        _rowtrace_kernel(fan, occluded, cull),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(tidp, midp, params, ts_blocks, ts_tre, *tiles)


# ---------------------------------------------------------------------------
# round driver (fully jitted — no host syncs)
# ---------------------------------------------------------------------------

_BUCKETS = (1, 4, 16, 64, 256, 1024, 4096)
_BUCKET_DIVS = (64, 16, 4, 1)   # active-prefix fractions of Rp per round

# state array order (all flat (R,)):
#   0..2 org, 3..5 dir, 6 tnear, 7 t, 8 prim(f32), 9 rayid(i32),
#   10 cur_mid(i32), 11 mcur_e(f32), 12 tcur_e(f32), 13 tcur_b(i32),
#   14 cand_e(f32), 15 cand_b(i32), 16 flags(i32: 1=done 2=need_mid)
N_STATE = 17
_DONE = 1
_NEED_MID = 2


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // _BUCKETS[-1]) * _BUCKETS[-1]


@functools.partial(jax.jit, static_argnames=("num_mids",))
def _mid_scan(state, mid_boxes, num_mids: int):
    """K_A in XLA: for need_mid lanes, pick the lex-next mid whose box
    the ray segment enters; none -> done."""
    ox, oy, oz, dxx, dyy, dzz, tn, t = state[:8]
    cur_mid, mcur_e = state[10], state[11]
    flags = state[16]
    need = (flags & _NEED_MID) != 0
    alive = need & ((flags & _DONE) == 0)
    rdx = _rcp_safe(dxx)
    rdy = _rcp_safe(dyy)
    rdz = _rcp_safe(dzz)
    orx, ory, orz = ox * rdx, oy * rdy, oz * rdz
    mb = mid_boxes.reshape(num_mids, 6)

    def body(m, carry):
        be, bm = carry
        tmin, tmax = _slab(mb[m, 0], mb[m, 1], mb[m, 2],
                           mb[m, 3], mb[m, 4], mb[m, 5],
                           rdx, rdy, rdz, orx, ory, orz, tn)
        ok = (tmin <= tmax) & (tmin <= t) \
            & ((tmin > mcur_e) | ((tmin == mcur_e) & (m > cur_mid)))
        upd = ok & (tmin < be)
        return jnp.where(upd, tmin, be), jnp.where(upd, m, bm)

    be, bm = jax.lax.fori_loop(
        0, num_mids, body,
        (jnp.full_like(t, INF), jnp.full_like(cur_mid, -1)))
    found = alive & (bm >= 0)
    out = list(state)
    out[10] = jnp.where(found, bm, cur_mid)
    out[11] = jnp.where(found, be, mcur_e)
    out[12] = jnp.where(found, NINF, state[12])   # reset treelet cursor
    out[13] = jnp.where(found, -1, state[13])
    out[15] = jnp.where(found, -1, state[15])     # no candidate yet
    nf = jnp.where(found, flags & ~_NEED_MID, flags)
    nf = jnp.where(alive & ~found, (nf | _DONE) & ~_NEED_MID, nf)
    out[16] = nf
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("fan",))
def _sort_state(state, fan: int):
    """Group by (done, mid, candidate-treelet); done rays to the back."""
    flags = state[16]
    done = (flags & _DONE) != 0
    cand_b = state[15]
    key = jnp.where(done, np.int32(2 ** 30),
                    state[10] * (fan + 1)
                    + jnp.where(cand_b >= 0, cand_b, fan))
    out = jax.lax.sort((key,) + tuple(state), num_keys=1)
    n_active = jnp.sum(~done)
    return tuple(out[1:]), n_active


@functools.partial(jax.jit,
                   static_argnames=("fan", "ntiles", "occluded", "cull",
                                    "interpret"))
def _kernel_round(state, blocks, tre, fan: int, ntiles: int,
                  occluded: bool, cull: bool, interpret: bool):
    """One K_TC pass over the (already grouped) first ntiles*1024 rays."""
    R = ntiles * 1024
    sl = [a[:R] for a in state]
    flags = sl[16]
    done = (flags & _DONE) != 0
    need = (flags & _NEED_MID) != 0
    cand_b = sl[15]
    has_cand = cand_b >= 0
    tid = jnp.clip(sl[10] * fan + jnp.maximum(cand_b, 0), 0, None)
    mid = jnp.clip(sl[10], 0, None)

    tidr = tid.reshape(-1, 128)
    midr = mid.reshape(-1, 128)
    row_tid = tidr[:, 0]
    row_mid = midr[:, 0]
    run_trav = (has_cand & ~done
                & (tid == jnp.repeat(row_tid, 128))).astype(jnp.int32)
    run_scan = (~done & ~need
                & (mid == jnp.repeat(row_mid, 128))).astype(jnp.int32)

    def t2(a):
        return a.reshape(-1, 128)

    tiles = (t2(sl[0]), t2(sl[1]), t2(sl[2]), t2(sl[3]), t2(sl[4]),
             t2(sl[5]), t2(sl[6]), t2(sl[7]), t2(sl[8]), t2(cand_b),
             t2(sl[14]), t2(sl[13]), t2(sl[12]),
             t2(run_trav), t2(run_scan))
    t_o, prim_o, cb_o, ce_o, tb_o, te_o, hasc_o = _run_rowtrace(
        blocks, tre, row_tid, row_mid, tiles, fan, ntiles, occluded, cull,
        interpret)

    def fl(a):
        return a.reshape(-1)

    out = list(state)
    scanned = fl(run_scan) != 0

    def merge(full, new):
        return full.at[:R].set(new)

    out[7] = merge(state[7], fl(t_o))
    out[8] = merge(state[8], fl(prim_o))
    out[12] = merge(state[12], fl(te_o))
    out[13] = merge(state[13], fl(tb_o))
    out[14] = merge(state[14], fl(ce_o))
    out[15] = merge(state[15], fl(cb_o))
    # scanned lanes with no candidate -> need a new mid
    nf = jnp.where(scanned & (fl(hasc_o) == 0), flags | _NEED_MID, flags)
    out[16] = merge(state[16], nf)
    return tuple(out)


def _prefix_sizes(Rp: int) -> tuple:
    """Static active-prefix sizes (ascending, multiples of 1024, <= Rp)."""
    sizes = []
    for dv in _BUCKET_DIVS:
        s = min(Rp, max(1024, -(-Rp // dv // 1024) * 1024))
        if s not in sizes:
            sizes.append(s)
    return tuple(sorted(sizes))


@functools.partial(jax.jit,
                   static_argnames=("fan", "num_mids", "num_treelets",
                                    "occluded", "cull", "interpret", "R",
                                    "max_rounds"))
def _rowtrace_impl(blocks, tre_boxes, mid_boxes, org, d, tn, tf, *,
                   fan: int, num_mids: int, num_treelets: int,
                   occluded: bool, cull: bool, interpret: bool, R: int,
                   max_rounds: int):
    Rp = _bucket(-(-R // 1024)) * 1024
    pad = Rp - R

    def pc(x, fill, dt=jnp.float32):
        return jnp.concatenate(
            [x.astype(dt), jnp.full((pad,), fill, dt)])

    state = (
        pc(org[:, 0], 0.0), pc(org[:, 1], 0.0), pc(org[:, 2], 0.0),
        pc(d[:, 0], 1.0), pc(d[:, 1], 0.0), pc(d[:, 2], 0.0),
        pc(tn, 0.0), pc(tf, NINF),
        pc(jnp.full((R,), -1, jnp.int32), -1, jnp.int32),    # prim (i32)
        pc(jnp.arange(R, dtype=jnp.int32), R, jnp.int32),
        pc(jnp.full((R,), -1, jnp.int32), -1, jnp.int32),    # cur_mid
        pc(jnp.full((R,), NINF), NINF),                       # mcur_e
        pc(jnp.full((R,), NINF), NINF),                       # tcur_e
        pc(jnp.full((R,), -1, jnp.int32), -1, jnp.int32),    # tcur_b
        pc(jnp.full((R,), INF), INF),                         # cand_e
        pc(jnp.full((R,), -1, jnp.int32), -1, jnp.int32),    # cand_b
        pc(jnp.full((R,), _NEED_MID, jnp.int32), _DONE, jnp.int32),
    )

    state = _mid_scan(state, mid_boxes, num_mids)
    state, n_active = _sort_state(state, fan)

    sizes = _prefix_sizes(Rp)

    def round_at(size):
        def branch(st):
            st = _kernel_round(st, blocks, tre_boxes, fan, size // 1024,
                               occluded, cull, interpret)
            sl = tuple(a[:size] for a in st)
            sl = _mid_scan(sl, mid_boxes, num_mids)
            sl, n_act = _sort_state(sl, fan)
            st = tuple(f.at[:size].set(s) for f, s in zip(st, sl))
            return st, n_act
        return branch

    branches = [round_at(s) for s in sizes]
    # The loop exhausts when every ray's (entry, id)-lexicographic
    # cursors run dry (each ray visits each mid/treelet at most once,
    # though a ray may WAIT rounds for its row's key-group turn, so the
    # round count is data-dependent and can exceed per-ray visit counts
    # by a wide margin at small ray counts). The cap is purely an
    # infinite-loop guard, far above any reachable round count (ADVICE
    # r2: no silent truncation).
    cap = max_rounds if max_rounds else (1 << 20)

    def body(carry):
        st, n_act, rounds = carry
        idx = jnp.int32(0)
        for s in sizes[:-1]:
            idx = idx + (n_act > s).astype(jnp.int32)
        st, n_act = jax.lax.switch(idx, branches, st)
        return st, n_act, rounds + 1

    def cond(carry):
        return (carry[1] > 0) & (carry[2] < cap)

    state, n_active, rounds = jax.lax.while_loop(
        cond, body, (state, n_active, jnp.int32(0)))

    # restore original ray order: sort by rayid (padding ids sort last)
    out = jax.lax.sort((state[9], state[7], state[8]), num_keys=1)
    t = out[1][:R]
    prim = out[2][:R]
    if occluded:
        return t, prim
    miss = prim < 0
    t = jnp.where(miss, tf.astype(jnp.float32), t)
    return t, prim


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _rowtrace_cv(arrs, static):
    blocks, tre_boxes, mid_boxes, org, d, tn, tf = arrs
    return _rowtrace_impl(blocks, tre_boxes, mid_boxes, org, d, tn, tf,
                          **dict(static))


def _rowtrace_cv_fwd(arrs, static):
    return _rowtrace_cv(arrs, static), arrs


def _rowtrace_cv_bwd(static, arrs, ct):
    # traversal output is a discrete hit SELECTION: zero cotangents by
    # design (gradients flow through diff/hit.py's re-evaluation of the
    # selected primitive, mirroring the stop-gradient split in SURVEY §7.6)
    return (jax.tree.map(jnp.zeros_like, arrs),)


_rowtrace_cv.defvjp(_rowtrace_cv_fwd, _rowtrace_cv_bwd)


def intersect_rowtrace(ts: TreeletScene, rays: Rays, occluded: bool = False,
                       cull: bool = False, interpret: bool = False,
                       max_rounds: int = 0):
    """Full traversal: returns (t, prim) flat over rays (prim = -1 miss;
    occluded: t == -inf marks hits). Fully jittable and grad-safe (zero
    traversal gradients via custom_vjp)."""
    org = rays.org.reshape(-1, 3)
    d = rays.dir.reshape(-1, 3)
    tn = rays.tnear.reshape(-1)
    tf = rays.tfar.reshape(-1)
    R = tn.shape[0]
    static = (("fan", ts.fan), ("num_mids", ts.num_mids),
              ("num_treelets", ts.num_treelets), ("occluded", bool(occluded)),
              ("cull", bool(cull)), ("interpret", bool(interpret)),
              ("R", R), ("max_rounds", int(max_rounds)))
    arrs = (ts.blocks, ts.tre_boxes, ts.mid_boxes, org, d, tn, tf)
    return _rowtrace_cv(arrs, static)
