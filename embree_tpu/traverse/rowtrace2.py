"""Per-lane treelet traversal v2 — bitmask chains + in-kernel turns.

v1 paid one FULL outer round (sort + dispatch + restage) per
(ray, treelet) visit and rescanned all mid/fan boxes on every visit;
with (mid, cand) groups of ~50 rays against 128-lane rows, most lanes
wait most rounds (measured: 1633 rounds / 0.42 Mray/s at 1M prims/rays).
v2 restructures the schedule around two ideas:

* **bitmask chains** — each ray's candidate MIDs are computed ONCE as a
  bitmask (an XLA prepass fori over mid boxes, <=MAX_MID_WORDS i32
  words per lane); per visited mid, a bitmask over its FAN treelet
  boxes is seeded in-kernel with slab tests against the lane's CURRENT
  best t. Advancing to the next work unit is find-first-set (exact
  float-exponent trick), not an O(M)/O(fan) rescan. Visits run in id
  order instead of entry order: closest-hit needs every candidate with
  tmin <= t_final visited in SOME order — the entry sort was only a
  termination heuristic, and per-candidate t-pruning (fan slabs test
  the live t) recovers most of it.

* **in-kernel consensus turns** — the kernel loops: each row picks the
  min current mid over its lanes, DMAs that mid's fan-box row, seeds
  fan masks for matching lanes, picks the min next-treelet id, DMAs
  that treelet block (dynamic index into the HBM blocks array), and
  walks it with the matching lanes. The outer XLA loop regroups by a
  (mid, next-candidate) sort key every IN_CAP turns; the r5 schedule
  counters showed stale turns cost more (while-loop iterations on
  low-participation walks) than sorts, so large buckets now regroup
  nearly every turn (_in_cap_for). Per-lane mid ids and fan ids
  advance monotonically, so the row consensus starves no lane.

Round 5 ("v5") doubled the treelet grain per the round-4 ledger
(BASELINE.md: fragmentation is set by rays-per-treelet group density,
so the lever is bigger GROUPS): treelets now hold up to 512 prims in
256 leaf pairs over the same 85 implicit inner slots (L3 nodes carry
FOUR pair children), and node bounds ride PACKED CONSERVATIVE-bf16
rows (build/treelets.py pack_bf16_bounds — the stock QuantizedNode
analog, bvh.h:1150-1324), so a node visit costs 12 gathers instead of
24 and a 26 KB block serves twice the prims. Leaf pairs drain in two
128-lane chunks. The round-4 dual-treelet service (+2.4% for a 2x
complexity tax) was removed.

Scene-size cap: mid masks hold MAX_MID_WORDS*32 = 768 mids; with
fan<=128 and ~240-prim average treelets that bounds rowtrace scenes to
~23M prims (larger scenes keep the packet path; scene.py dispatch
checks `fits_rowtrace2`). A 16.1M-tri build measures 67840 treelets /
530 mids / 1.81 GB of HBM blocks (tools/measure_bigscene.py).

Reference analogs: single-ray traversal bvh_intersector1.cpp:41-127,
quantized nodes bvh.h:1150-1324, Moeller triangles
triangle_intersector_moeller.h:75-112.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..build.treelets import (BLOCK_ROWS, L3_BASE, LEAF_FIELDS,
                              N_INNER as N_INNER_SLOTS, NODE_ROWS,
                              TreeletScene)
from ..core.rayhit import Rays

ROBUST_MIN = np.float32(1.0 - 3.0 * 2.0 ** -23)
ROBUST_MAX = np.float32(1.0 + 3.0 * 2.0 ** -23)
INF = np.float32(np.inf)
NINF = np.float32(-np.inf)
MAX_MID_WORDS = 24         # mid-mask capacity: 768 mids (r5: cap lift,
#                            VERDICT r4 #4 — 768 mids x fan 128 x ~240
#                            prims/treelet ~ 23M prims on the fast path;
#                            mask words and the mbox PICK rows scale
#                            with the scene, so small scenes pay nothing)
BIG = np.int32(1 << 24)
DONE_KEY = np.int32(1 << 30)

_PICK = np.int32(-1)       # pick next mid from mask
_DONE = np.int32(-2)       # ray finished


def fits_rowtrace2(num_mids: int, fan: int) -> bool:
    return num_mids <= MAX_MID_WORDS * 32 and fan <= 128


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
    tmax = jnp.where(lox <= hix, tmax, NINF)   # inverted/pad boxes miss
    return jnp.maximum(tmin, tn), tmax


def _ffs32(word):
    """Per-lane index of the lowest set bit (32 if zero). Single-bit
    int -> f32 conversion is exact; the exponent field IS the index."""
    lsb = jnp.bitwise_and(word, jnp.negative(word))
    f = lsb.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(f, jnp.int32)
    # mask the sign bit: lsb == 1<<31 converts to a NEGATIVE float whose
    # magnitude exponent still encodes index 31
    bits = jnp.bitwise_and(bits, jnp.int32(0x7FFFFFFF))
    idx = jax.lax.shift_right_logical(bits, 23) - 127
    return jnp.where(word == 0, 32, idx)


def _ffs_words(words):
    """FFS across word registers -> global bit index (BIG if none)."""
    out = jnp.full_like(words[0], BIG)
    for w, word in enumerate(words):
        idx = _ffs32(word) + w * 32
        out = jnp.where((out == BIG) & (word != 0), idx, out)
    return out


def _clear_bit(words, idx, mask):
    out = []
    for w, word in enumerate(words):
        bit = jax.lax.shift_left(jnp.int32(1),
                                 jnp.clip(idx - w * 32, 0, 31))
        hit = mask & (idx >= w * 32) & (idx < (w + 1) * 32)
        out.append(jnp.where(hit, jnp.bitwise_and(word,
                                                  jnp.invert(bit)), word))
    return out


def _unpack_bounds(v):
    """Split a packed-bf16 f32 lane into (lo, hi) f32 values: hi 16
    bits = lo bound, lo 16 bits = hi bound (exact bf16->f32 widening)."""
    bits = jax.lax.bitcast_convert_type(v, jnp.int32)
    lo = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(bits, jnp.int32(-65536)), jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(bits, 16), jnp.float32)
    return lo, hi


def _rowtrace2_kernel(fan: int, mid_words: int, fan_words: int,
                      in_cap: int, occluded: bool, cull: bool):

    def kernel(params, blocks, tre, mbox, *args):
        # inputs: 7 ray + t,prim,cur,seed + mid_words + fan_words
        n_in = 11 + mid_words + fan_words
        ins = args[:n_in]
        outs = args[n_in:n_in + 6 + mid_words + fan_words]
        scratch = args[n_in + 6 + mid_words + fan_words:]
        (ox, oy, oz, dx, dy, dz, tn,
         t_in, prim_in, cur_in, seed_in) = ins[:11]
        mm_in = ins[11:11 + mid_words]
        fm_in = ins[11 + mid_words:]
        (t_o, prim_o, cur_o, seed_o, key_o, stats_o) = outs[:6]
        mm_o = outs[6:6 + mid_words]
        fm_o = outs[6 + mid_words:]
        stage, midstage, sem1, sem2 = scratch

        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        rdx = _rcp_safe(d_x)
        rdy = _rcp_safe(d_y)
        rdz = _rcp_safe(d_z)
        orx = o_x * rdx
        ory = o_y * rdy
        orz = o_z * rdz
        tnear = tn[:]
        zero_i = jnp.zeros_like(t_in[:], jnp.int32)

        def fetch_node(cur):
            """Node fetch for inner slot cur: 12 packed-row gathers ->
            24 unpacked bound fields (lo then hi, each [axis*4+child])."""
            lane = jnp.bitwise_and(jnp.maximum(cur, 0), 127)
            los, his = [], []
            for f in range(NODE_ROWS):
                v = jnp.take_along_axis(stage[:, f, :], lane, axis=1)
                lo, hi = _unpack_bounds(v)
                los.append(lo)
                his.append(hi)
            return los + his

        def walk(part, t, prim):
            """Two-phase treelet walk. Phase 1 walks the implicit inner
            BVH4 with a 3-word NODE BITMASK (85 inner slots): each step
            FFS-picks the next pending inner node, gathers its 12
            packed bound rows, slabs the 4 children, and ORs hit
            children back into the mask (4 consecutive bits — one
            shifted nibble) or, for L3 nodes, into the 256-bit leaf-pair
            mask (4 bits at 4*(cur-21)). No per-lane stack: pop =
            FFS+clear, and visit order is slot (BFS) order — order is
            irrelevant here because leaf tests are deferred, so no t
            tightens during the node phase anyway. Phase 2 FFS-drains
            the pair mask one 128-pair CHUNK at a time with that
            chunk's 20 leaf rows (Ng recomputed in-kernel from e1/e2).

            Iteration caps count ITERATIONS, each retiring NU units
            (NU = 8; 4 on wide-mask shapes): a lane visits each of the
            85 inner slots at most once (cap ceil(85/NU)+2) and each of
            a chunk's 128 pairs at most once (cap ceil(128/NU)+2), so
            the loops cannot silently truncate."""
            PM_WORDS = 8   # 256 leaf-pair bits
            NM_WORDS = 3   # 85 inner-slot bits
            NU = 8 if mid_words <= 8 else 4   # see node_step note
            node_cap = -(-N_INNER_SLOTS // NU) + 2
            leaf_cap = -(-128 // NU) + 2

            t0_c = t

            def node_visit(vals, cur, alive, nm, pm):
                is_l3 = cur >= L3_BASE
                hits = []
                for c in range(4):
                    tmin, tmax = _slab(
                        vals[c], vals[4 + c], vals[8 + c],
                        vals[12 + c], vals[16 + c], vals[20 + c],
                        rdx, rdy, rdz, orx, ory, orz, tnear)
                    hits.append(alive & (tmin <= tmax) & (tmin <= t0_c))
                nib = (hits[0].astype(jnp.int32)
                       + 2 * hits[1].astype(jnp.int32)
                       + 4 * hits[2].astype(jnp.int32)
                       + 8 * hits[3].astype(jnp.int32))
                # inner children: 4 consecutive bits at 4*cur+1
                node_mode = alive & ~is_l3
                start = 4 * cur + 1
                wq = jax.lax.shift_right_logical(jnp.maximum(start, 0), 5)
                o = jnp.bitwise_and(start, 31)
                lo_bits = jax.lax.shift_left(nib, o)
                hi_bits = jnp.where(
                    o == 0, 0,
                    jax.lax.shift_right_logical(
                        nib, jnp.bitwise_and(32 - o, 31)))
                for w in range(NM_WORDS):
                    add = jnp.where(node_mode & (wq == w), lo_bits, 0)
                    add = jnp.bitwise_or(
                        add, jnp.where(node_mode & (wq + 1 == w),
                                       hi_bits, 0))
                    nm[w] = jnp.bitwise_or(nm[w], add)
                # L3: 4 bits at pidx = 4*(cur-21) (multiple of 4, so
                # never straddles a word)
                leaf_mode = alive & is_l3
                pidx = 4 * (cur - L3_BASE)
                pq = jax.lax.shift_right_logical(jnp.maximum(pidx, 0), 5)
                pbits = jax.lax.shift_left(nib, jnp.bitwise_and(pidx, 31))
                for w in range(PM_WORDS):
                    pm[w] = jnp.bitwise_or(
                        pm[w], jnp.where(leaf_mode & (pq == w), pbits, 0))
                return nm, pm

            def node_step(carry):
                nm = list(carry[:NM_WORDS])
                pm = list(carry[NM_WORDS:NM_WORDS + PM_WORDS])
                iters = carry[NM_WORDS + PM_WORDS]
                # visit FOUR pending inner nodes per iteration (visit
                # order is irrelevant — leaf tests are deferred): the
                # r5 schedule counters measured ~0.7 us of Mosaic
                # while-loop overhead PER ITERATION dominating the
                # whole forward (642k iterations ~ 450 ms at 2M rays).
                # Unrolling is nearly free in gather terms: per
                # iteration the row pays unroll x 12 gathers, but the
                # iteration count shrinks by the same factor, so total
                # row gathers stay ~constant while loop overhead
                # divides by the unroll. Wide-mask shapes (mid_words >
                # 8, i.e. >256-mid scenes) halve the unroll to keep the
                # remote Mosaic compile tractable (the kernel body
                # scales with unroll x mask words).
                for _u in range(NU):
                    nxt = _ffs_words(nm)
                    have = nxt < BIG
                    nm = _clear_bit(nm, nxt, have)
                    cur = jnp.where(have, nxt, 0)
                    vals = fetch_node(cur)
                    nm, pm = node_visit(vals, cur, have, nm, pm)
                return tuple(nm + pm + [iters + 1])

            def node_cond(carry):
                anyb = carry[0] != 0
                for w in carry[1:NM_WORDS]:
                    anyb = anyb | (w != 0)
                return jnp.any(anyb) & (carry[NM_WORDS + PM_WORDS] < node_cap)

            # root step: every participating lane is at slot 0, so the
            # 12 packed fields are STATIC row reads (no gather)
            root_los, root_his = [], []
            for f in range(NODE_ROWS):
                v = jnp.broadcast_to(stage[:, f, 0:1], t.shape)
                lo, hi = _unpack_bounds(v)
                root_los.append(lo)
                root_his.append(hi)
            nm0 = [zero_i] * NM_WORDS
            pm0 = [zero_i] * PM_WORDS
            nm0, pm0 = node_visit(root_los + root_his, zero_i, part,
                                  nm0, pm0)
            out = jax.lax.while_loop(
                node_cond, node_step,
                tuple(nm0 + pm0 + [jnp.int32(0)]))
            pm = list(out[NM_WORDS:NM_WORDS + PM_WORDS])

            def drain_chunk(chunk, t, prim, pmc):
                """FFS-drain one 128-pair chunk (4 mask words) against
                its 20 leaf rows; 2 pairs (4 triangles) per step."""
                base = NODE_ROWS + chunk * LEAF_FIELDS

                def leaf_step(carry):
                    t, prim, iters = carry[:3]
                    pmc = list(carry[3:])
                    for _u in range(NU):
                        p = _ffs_words(pmc)
                        have = p < BIG
                        pmc = _clear_bit(pmc, p, have)
                        lane = jnp.bitwise_and(jnp.maximum(p, 0), 127)
                        vals = []
                        for f in range(LEAF_FIELDS):
                            vals.append(jnp.take_along_axis(
                                stage[:, base + f, :], lane, axis=1))
                        for q, pofs in ((0, 0), (1, 9)):
                            v0x, v0y, v0z = (vals[pofs], vals[pofs + 1],
                                             vals[pofs + 2])
                            e1x, e1y, e1z = (vals[pofs + 3],
                                             vals[pofs + 4],
                                             vals[pofs + 5])
                            e2x, e2y, e2z = (vals[pofs + 6],
                                             vals[pofs + 7],
                                             vals[pofs + 8])
                            # Ng = cross(e2, e1) recomputed (6 fewer
                            # gathers; matches build/treelets.py)
                            ngx = e2y * e1z - e2z * e1y
                            ngy = e2z * e1x - e2x * e1z
                            ngz = e2x * e1y - e2y * e1x
                            pid_i = jax.lax.bitcast_convert_type(
                                vals[18 + q], jnp.int32)
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
                            ok = have & front & (u_s >= 0.0) \
                                & (v_s >= 0.0) & (u_s + v_s <= absden) \
                                & (absden * tnear < t_s) \
                                & (t_s <= absden * t)
                            if occluded:
                                t = jnp.where(ok, NINF, t)
                            else:
                                t = jnp.where(
                                    ok, t_s / jnp.maximum(absden, 1e-37),
                                    t)
                                prim = jnp.where(ok, pid_i, prim)
                    if occluded:
                        # finished lanes drop their remaining pairs
                        pmc = [jnp.where(t == NINF, 0, w) for w in pmc]
                    return tuple([t, prim, iters + 1] + pmc)

                def leaf_cond(carry):
                    anyp = carry[3] != 0
                    for w in carry[4:]:
                        anyp = anyp | (w != 0)
                    return jnp.any(anyp) & (carry[2] < leaf_cap)

                outl = jax.lax.while_loop(
                    leaf_cond, leaf_step,
                    tuple([t, prim, jnp.int32(0)] + pmc))
                return outl[0], outl[1], outl[2]

            # chunk masks are chunk-local 128-bit (words 0..3 / 4..7)
            n_it = out[NM_WORDS + PM_WORDS]
            t, prim, l_it0 = drain_chunk(0, t, prim, pm[:4])
            t, prim, l_it1 = drain_chunk(1, t, prim, pm[4:])
            return t, prim, n_it, l_it0 + l_it1

        def _fan_test(b_static_or_lane, t):
            pl_ = [jnp.broadcast_to(
                midstage[:, p, b_static_or_lane:b_static_or_lane + 1],
                t.shape) for p in range(6)]
            tmin, tmax = _slab(pl_[0], pl_[1], pl_[2], pl_[3], pl_[4],
                               pl_[5], rdx, rdy, rdz, orx, ory, orz,
                               tnear)
            return (tmin <= tmax) & (tmin <= t)

        def fan_pass(t):
            """Slab the staged fan-box row against the lane's CURRENT t
            (per-candidate pruning recovers entry-order termination).
            Small fans unroll statically; large fans (the 16M-prim
            fan=128 builds) roll a fori_loop with per-lane gathers —
            the 128-wide static unroll made the remote Mosaic compile
            take tens of minutes (r5)."""
            if fan <= 40:
                fm = [zero_i] * fan_words
                for b in range(fan):
                    ok = _fan_test(b, t)
                    bit = np.int32(np.uint32(1 << (b % 32)))  # bit 31 wraps
                    fm[b // 32] = jnp.bitwise_or(
                        fm[b // 32], jnp.where(ok, bit, 0))
                return fm

            def body(b4, fm):
                fm = list(fm)
                for u in range(4):
                    b = b4 * 4 + u
                    lane = jnp.full_like(zero_i, 0) + b
                    mb = [jnp.take_along_axis(midstage[:, p, :],
                                              jnp.bitwise_and(lane, 127),
                                              axis=1) for p in range(6)]
                    tmin, tmax = _slab(mb[0], mb[1], mb[2], mb[3], mb[4],
                                       mb[5], rdx, rdy, rdz, orx, ory,
                                       orz, tnear)
                    ok = (tmin <= tmax) & (tmin <= t)
                    bit = jax.lax.shift_left(jnp.int32(1),
                                             jnp.bitwise_and(b, 31))
                    wq = jax.lax.shift_right_logical(b, 5)
                    for w in range(fan_words):
                        fm[w] = jnp.where(ok & (wq == w),
                                          jnp.bitwise_or(fm[w], bit),
                                          fm[w])
                return tuple(fm)

            fm = jax.lax.fori_loop(0, -(-fan // 4), body,
                                   tuple([zero_i] * fan_words))
            return list(fm)

        def turn(carry):
            (t, prim, cur, seed, turns) = carry[:5]
            mm = list(carry[5:5 + mid_words])
            fm = list(carry[5 + mid_words:5 + mid_words + fan_words])
            st_walk, st_part, st_nit, st_lit = \
                carry[5 + mid_words + fan_words:]

            # 1: PICK lanes take their next mid (or finish). Each
            # candidate mid's box is slab-tested against the lane's
            # CURRENT t first (mid boxes live in VMEM — 12 gathers):
            # mids behind an existing hit are cleared without paying
            # their fan-row DMA + fan-box fan pass. Mids are visited in
            # id order, so without this, a ray that hit early would
            # still fan-pass every remaining candidate mid (BASELINE
            # measured 5.09 mid entries but 1.6 treelet walks per hit
            # ray). Unrolled 4x: up to 4 dead mids retired per turn.
            def do_pick(args):
                mm = list(args[:mid_words])
                cur, seed = args[mid_words], args[mid_words + 1]
                pick = cur == _PICK
                n_mrows = mbox.shape[1]
                for _ in range(4):
                    nxt = _ffs_words(mm)
                    havebit = pick & (nxt < BIG)
                    lane = jnp.bitwise_and(jnp.maximum(nxt, 0), 127)
                    mrow = jax.lax.shift_right_logical(
                        jnp.maximum(nxt, 0), 7)
                    mb = []
                    for f in range(6):
                        v = jnp.take_along_axis(
                            jnp.broadcast_to(mbox[f, 0, :][None, :],
                                             (8, 128)), lane, axis=1)
                        for rr_ in range(1, n_mrows):
                            vr = jnp.take_along_axis(
                                jnp.broadcast_to(mbox[f, rr_, :][None, :],
                                                 (8, 128)), lane, axis=1)
                            v = jnp.where(mrow == rr_, vr, v)
                        mb.append(v)
                    tmin_m, tmax_m = _slab(mb[0], mb[1], mb[2], mb[3],
                                           mb[4], mb[5], rdx, rdy, rdz,
                                           orx, ory, orz, tnear)
                    livemid = (tmin_m <= tmax_m) & (tmin_m <= t)
                    take = havebit & livemid
                    mm = _clear_bit(mm, nxt, havebit)
                    cur = jnp.where(take, nxt, cur)
                    seed = jnp.where(take, 0, seed)
                    pick = pick & ~take
                none_left = pick & (_ffs_words(mm) == BIG)
                cur = jnp.where(none_left, _DONE, cur)
                return tuple(mm + [cur, seed])

            # whole PICK phase (4x unroll: ~48 gathers + 4 slab/FFS
            # passes) skipped when no lane is between mids this turn
            out_p = jax.lax.cond(
                jnp.any(cur == _PICK), do_pick, lambda a: a,
                tuple(mm + [cur, seed]))
            mm = list(out_p[:mid_words])
            cur, seed = out_p[mid_words], out_p[mid_words + 1]

            # 2: per-row consensus mid; stage its fan-box row.
            # All 8 row DMAs are STARTED before any wait so their
            # latencies overlap (serial start/wait per row measured ~8x
            # slower end-to-end).
            active = cur >= 0
            curv = jnp.where(active, cur, BIG)
            row_mids = [jnp.min(curv[r:r + 1, :]) for r in range(8)]
            for r in range(8):
                @pl.when(row_mids[r] < BIG)
                def _(rm=row_mids[r], r=r):
                    pltpu.make_async_copy(tre.at[rm], midstage.at[r],
                                          sem2.at[r]).start()
            for r in range(8):
                @pl.when(row_mids[r] < BIG)
                def _(rm=row_mids[r], r=r):
                    pltpu.make_async_copy(tre.at[rm], midstage.at[r],
                                          sem2.at[r]).wait()
            row_mid = jnp.concatenate(
                [jnp.full((1, 128), rm, jnp.int32) for rm in row_mids],
                axis=0)
            served = active & (cur == row_mid)

            # 3: seed fan masks for served, unseeded lanes (skipped
            # entirely when every served lane is already seeded)
            need_seed = served & (seed == 0)
            fm = jax.lax.cond(
                jnp.any(need_seed),
                lambda fm: tuple(
                    jnp.where(need_seed, n, o)
                    for n, o in zip(fan_pass(t), fm)),
                lambda fm: tuple(fm), tuple(fm))
            fm = list(fm)
            seed = jnp.where(need_seed, 1, seed)

            # 4: per-row consensus treelet; stage (overlapped) + walk
            cand = _ffs_words(fm)
            has_cand = served & (cand < BIG)
            candv = jnp.where(has_cand, cand, BIG)
            row_tids = [jnp.min(candv[r:r + 1, :]) for r in range(8)]
            for r in range(8):
                @pl.when(row_tids[r] < BIG)
                def _(rm=row_mids[r], rt=row_tids[r], r=r):
                    pltpu.make_async_copy(
                        blocks.at[rm * fan + rt], stage.at[r],
                        sem1.at[r]).start()
            row_tid = jnp.concatenate(
                [jnp.full((1, 128), rt, jnp.int32) for rt in row_tids],
                axis=0)
            part = has_cand & (cand == row_tid)
            for r in range(8):
                @pl.when(row_tids[r] < BIG)
                def _(rm=row_mids[r], rt=row_tids[r], r=r):
                    pltpu.make_async_copy(
                        blocks.at[rm * fan + rt], stage.at[r],
                        sem1.at[r]).wait()
            fm = _clear_bit(fm, cand, part)
            # no participants -> the walk's while cond is false on entry
            t, prim, n_it, l_it = walk(part, t, prim)
            st_walk = st_walk + jnp.any(part).astype(jnp.int32)
            st_part = st_part + jnp.sum(part.astype(jnp.int32))
            st_nit = st_nit + n_it
            st_lit = st_lit + l_it
            if occluded:
                cur = jnp.where(t == NINF, _DONE, cur)

            # 5: served lanes whose fan mask drained -> next mid
            drained = served & (cur >= 0) & (_ffs_words(fm) == BIG)
            cur = jnp.where(drained, _PICK, cur)
            seed = jnp.where(drained, 0, seed)

            return tuple([t, prim, cur, seed, turns + 1] + mm + fm
                         + [st_walk, st_part, st_nit, st_lit])

        def turn_cond(carry):
            cur, turns = carry[2], carry[4]
            return jnp.any(cur != _DONE) & (turns < in_cap)

        init = tuple([t_in[:], prim_in[:], cur_in[:], seed_in[:],
                      jnp.int32(0)]
                     + [m[:] for m in mm_in] + [f[:] for f in fm_in]
                     + [jnp.int32(0)] * 4)
        out = jax.lax.while_loop(turn_cond, turn, init)
        t, prim, cur, seed = out[0], out[1], out[2], out[3]
        mm = list(out[5:5 + mid_words])
        fm = list(out[5 + mid_words:5 + mid_words + fan_words])
        st_turns = out[4]
        st_walk, st_part, st_nit, st_lit = \
            out[5 + mid_words + fan_words:]

        t_o[:] = t
        prim_o[:] = prim
        cur_o[:] = cur
        seed_o[:] = seed
        for w in range(mid_words):
            mm_o[w][:] = mm[w]
        for w in range(fan_words):
            fm_o[w][:] = fm[w]
        nxt = _ffs_words(fm)
        key_o[:] = jnp.where(cur == _DONE, DONE_KEY,
                             jnp.maximum(cur, 0) * 130
                             + jnp.where(nxt < BIG, nxt, 129))
        # per-tile schedule counters (STAT3 analog): sublane r carries
        # [turns, walks, sum(participants), node iters, leaf iters]
        row = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        sv = jnp.where(row == 0, st_turns,
                       jnp.where(row == 1, st_walk,
                                 jnp.where(row == 2, st_part,
                                           jnp.where(row == 3, st_nit,
                                                     st_lit))))
        stats_o[:] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) == 0, sv, 0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("fan", "mid_words", "fan_words",
                                    "ntiles", "in_cap", "occluded", "cull",
                                    "interpret"))
def _run_rowtrace2(ts_blocks, ts_tre, mbox, tiles, fan: int,
                   mid_words: int, fan_words: int, ntiles: int,
                   in_cap: int, occluded: bool, cull: bool,
                   interpret: bool):
    params = jnp.zeros((1,), jnp.int32)
    tile = (8, 128)
    ray_spec = pl.BlockSpec(tile, lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    mbox_spec = pl.BlockSpec((6, mbox.shape[1], 128),
                             lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    n_in = 11 + mid_words + fan_words
    n_out = 6 + mid_words + fan_words
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  mbox_spec]
        + [ray_spec] * n_in,
        out_specs=tuple([ray_spec] * n_out),
        scratch_shapes=(
            [pltpu.VMEM((8, BLOCK_ROWS, 128), jnp.float32),
             pltpu.VMEM((8, 6, 128), jnp.float32),
             pltpu.SemaphoreType.DMA((8,)),
             pltpu.SemaphoreType.DMA((8,))]),
    )
    dts = ([jnp.float32, jnp.int32, jnp.int32, jnp.int32, jnp.int32,
            jnp.int32]
           + [jnp.int32] * (mid_words + fan_words))
    out_shape = tuple(jax.ShapeDtypeStruct((ntiles * 8, 128), dt)
                      for dt in dts)
    return pl.pallas_call(
        _rowtrace2_kernel(fan, mid_words, fan_words, in_cap, occluded,
                          cull),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(params, ts_blocks, ts_tre, mbox, *tiles)


# ---------------------------------------------------------------------------
# outer driver
# ---------------------------------------------------------------------------

_BUCKET_DIVS = (256, 64, 16, 4, 2, 1)


def _in_cap_for(size: int, Rp: int) -> int:
    """Regroup cadence: global sorts keep rows coherent; stale in-kernel
    turns cost while-loop iterations, which the r5 schedule counters
    measured as THE dominant cost (~0.7 us Mosaic overhead per
    iteration). The r5 sweep (x1=3.72, half=4.68, quarter=4.86 Mray/s
    fwd at 2M rays; x2/x4 regress) landed on sorting nearly every
    turn while the active set is large."""
    if size >= Rp:
        return 1
    if size * 4 >= Rp:
        return 2
    if size * 16 >= Rp:
        return 4
    if size * 64 >= Rp:
        return 8
    return 32


def _bucket1024(n: int) -> int:
    return -(-n // 1024) * 1024


def _prefix_sizes(Rp: int) -> tuple:
    sizes = []
    for dv in _BUCKET_DIVS:
        s = min(Rp, max(1024, _bucket1024(Rp // dv)))
        if s not in sizes:
            sizes.append(s)
    return tuple(sorted(sizes))


@functools.partial(jax.jit, static_argnames=("num_mids", "mid_words"))
def _mid_mask_prepass(org, d, tn, tf, mid_boxes, num_mids: int,
                      mid_words: int):
    """XLA prepass: per-ray bitmask of entered mid boxes + first-mid
    sort key. One O(M) pass per ray for the WHOLE traversal.

    Vectorized (R, 32)-broadcast per mask word — the r4 fori_loop form
    paid ~2.5 ms of loop overhead PER MID on this backend (measured
    ~0.5 s of the 2M-ray forward); the broadcast form fuses into a
    handful of full-width elementwise passes."""
    rdx = _rcp_safe(d[:, 0])[:, None]
    rdy = _rcp_safe(d[:, 1])[:, None]
    rdz = _rcp_safe(d[:, 2])[:, None]
    orx = org[:, 0][:, None] * rdx
    ory = org[:, 1][:, None] * rdy
    orz = org[:, 2][:, None] * rdz
    tnc = tn[:, None]
    tfc = tf[:, None]
    mb = mid_boxes.reshape(-1, 6)
    M = mb.shape[0]
    mm = []
    for w in range(mid_words):
        lo_w = min(w * 32, M)
        hi_w = min(w * 32 + 32, M)
        nw = hi_w - lo_w
        if nw == 0:
            mm.append(jnp.zeros(org.shape[0], jnp.int32))
            continue
        b = mb[lo_w:hi_w]                              # (nw, 6)
        tmin, tmax = _slab(b[None, :, 0], b[None, :, 1], b[None, :, 2],
                           b[None, :, 3], b[None, :, 4], b[None, :, 5],
                           rdx, rdy, rdz, orx, ory, orz, tnc)
        ok = (tmin <= tmax) & (tmin <= tfc)            # (R, nw)
        bits = jnp.asarray(
            np.array([np.int32(np.uint32(1 << j)) for j in range(nw)]))
        # distinct single bits: wrap-add == bitwise OR
        mm.append(jnp.sum(jnp.where(ok, bits[None, :], 0), axis=1,
                          dtype=jnp.int32))
    first = _ffs_words(mm)
    key = jnp.where(first < BIG, first * 130, DONE_KEY)
    return tuple(mm), key


@functools.partial(jax.jit,
                   static_argnames=("fan", "num_mids", "num_treelets",
                                    "occluded", "cull", "interpret", "R",
                                    "max_rounds"))
def _rowtrace2_impl(blocks, tre_boxes, mid_boxes, org, d, tn, tf, *,
                    fan: int, num_mids: int, num_treelets: int,
                    occluded: bool, cull: bool, interpret: bool, R: int,
                    max_rounds: int):
    mid_words = max(1, -(-num_mids // 32))
    fan_words = max(1, -(-fan // 32))
    Rp = _bucket1024(R)
    pad = Rp - R

    mm, key = _mid_mask_prepass(org, d, tn, tf, mid_boxes, num_mids,
                                mid_words)

    # mid boxes for the in-kernel PICK prune: (6, n_mrows, 128) VMEM
    # layout (row = mid >> 7), pads inverted so they can never test live
    mb2 = mid_boxes.reshape(-1, 6)
    n_mrows = max(2, -(-mb2.shape[0] // 128))
    padm = n_mrows * 128 - mb2.shape[0]
    padrow = jnp.concatenate([jnp.full((padm, 3), INF, jnp.float32),
                              jnp.full((padm, 3), NINF, jnp.float32)],
                             axis=1)
    mbox = jnp.concatenate([mb2, padrow], axis=0).T.reshape(6, n_mrows,
                                                            128)

    def pc(x, fill, dt=jnp.float32):
        return jnp.concatenate([x.astype(dt), jnp.full((pad,), fill, dt)])

    zero_i = jnp.full((R,), 0, jnp.int32)
    state = (
        pc(org[:, 0], 0.0), pc(org[:, 1], 0.0), pc(org[:, 2], 0.0),
        pc(d[:, 0], 1.0), pc(d[:, 1], 0.0), pc(d[:, 2], 0.0),
        pc(tn, 0.0),
        pc(tf, NINF),                                        # 7 t
        pc(jnp.full((R,), -1, jnp.int32), -1, jnp.int32),    # 8 prim
        pc(jnp.where(key < DONE_KEY, _PICK, _DONE), _DONE,
           jnp.int32),                                       # 9 cur
        pc(zero_i, 0, jnp.int32),                            # 10 seed
        pc(jnp.arange(R, dtype=jnp.int32), R, jnp.int32),    # 11 rayid
        pc(key, DONE_KEY, jnp.int32),                        # 12 key
    ) + tuple(pc(m, 0, jnp.int32) for m in mm) \
        + tuple(pc(zero_i, 0, jnp.int32) for _ in range(fan_words))

    def sort_state(st):
        out = jax.lax.sort((st[12],) + st, num_keys=1)[1:]
        n_active = jnp.sum(out[12] != DONE_KEY)
        return tuple(out), n_active

    state, n_active = sort_state(state)
    sizes = _prefix_sizes(Rp)

    def round_at(size):
        ntiles = size // 1024
        in_cap = _in_cap_for(size, Rp)

        def branch(st):
            def t2(i):
                return st[i][:size].reshape(-1, 128)
            tiles = tuple(t2(i) for i in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
                          ) + tuple(t2(13 + w)
                                    for w in range(mid_words + fan_words))
            outs = _run_rowtrace2(blocks, tre_boxes, mbox, tiles, fan,
                                  mid_words, fan_words, ntiles, in_cap,
                                  occluded, cull, interpret)
            st = list(st)

            def fl(a):
                return a.reshape(-1)

            def merge(i, new):
                st[i] = st[i].at[:size].set(fl(new))

            merge(7, outs[0])
            merge(8, outs[1])
            merge(9, outs[2])
            merge(10, outs[3])
            merge(12, outs[4])
            stats = jnp.sum(outs[5].reshape(-1, 8, 128)[:, :5, 0], axis=0)
            for w in range(mid_words + fan_words):
                merge(13 + w, outs[6 + w])
            sl = tuple(a[:size] for a in st)
            sl2 = jax.lax.sort((sl[12],) + sl, num_keys=1)[1:]
            st = tuple(f.at[:size].set(s) for f, s in zip(st, sl2))
            n_act = jnp.sum(sl2[12] != DONE_KEY)
            return st, n_act, stats
        return branch

    branches = [round_at(s) for s in sizes]
    cap = max_rounds if max_rounds else (1 << 16)

    def body(carry):
        st, n_act, rounds, stats = carry
        idx = jnp.int32(0)
        for s in sizes[:-1]:
            idx = idx + (n_act > s).astype(jnp.int32)
        st, n_act, rstats = jax.lax.switch(idx, branches, st)
        return st, n_act, rounds + 1, stats + rstats

    def cond(carry):
        return (carry[1] > 0) & (carry[2] < cap)

    state, n_active, rounds, stats = jax.lax.while_loop(
        cond, body, (state, n_active, jnp.int32(0),
                     jnp.zeros((5,), jnp.int32)))

    out = jax.lax.sort((state[11], state[7], state[8]), num_keys=1)
    t = out[1][:R]
    prim = out[2][:R]
    if occluded:
        return t, prim, (rounds, stats)
    miss = prim < 0
    t = jnp.where(miss, tf.astype(jnp.float32), t)
    return t, prim, (rounds, stats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _rowtrace2_cv(arrs, static):
    blocks, tre_boxes, mid_boxes, org, d, tn, tf = arrs
    t, prim, _st = _rowtrace2_impl(blocks, tre_boxes, mid_boxes, org, d,
                                   tn, tf, **dict(static))
    return t, prim


def rowtrace2_schedule_stats(ts, rays, **kw):
    """Debug/roofline entry: full traversal + (rounds, [turns, walks,
    sum participants, node iters, leaf iters]) schedule counters."""
    org = rays.org.reshape(-1, 3)
    d = rays.dir.reshape(-1, 3)
    tn = rays.tnear.reshape(-1)
    tf = rays.tfar.reshape(-1)
    t, prim, st = _rowtrace2_impl(
        ts.blocks, ts.tre_boxes, ts.mid_boxes, org, d, tn, tf,
        fan=ts.fan, num_mids=ts.num_mids, num_treelets=ts.num_treelets,
        occluded=False, cull=False, interpret=kw.get("interpret", False),
        R=tn.shape[0], max_rounds=kw.get("max_rounds", 0))
    return t, prim, st


def _rt2_fwd(arrs, static):
    return _rowtrace2_cv(arrs, static), arrs


def _rt2_bwd(static, arrs, ct):
    # discrete hit selection: zero cotangents (gradients flow through
    # diff/hit.py's re-evaluation, mirroring the stop-gradient split)
    return (jax.tree.map(jnp.zeros_like, arrs),)


_rowtrace2_cv.defvjp(_rt2_fwd, _rt2_bwd)


def intersect_rowtrace2(ts: TreeletScene, rays: Rays,
                        occluded: bool = False, cull: bool = False,
                        interpret: bool = False, max_rounds: int = 0):
    """Full traversal: (t, prim) flat over rays (prim = -1 miss;
    occluded: t == -inf marks hits). Jittable; zero traversal grads."""
    org = rays.org.reshape(-1, 3)
    d = rays.dir.reshape(-1, 3)
    tn = rays.tnear.reshape(-1)
    tf = rays.tfar.reshape(-1)
    R = tn.shape[0]
    static = (("fan", ts.fan), ("num_mids", ts.num_mids),
              ("num_treelets", ts.num_treelets),
              ("occluded", bool(occluded)), ("cull", bool(cull)),
              ("interpret", bool(interpret)), ("R", R),
              ("max_rounds", int(max_rounds)))
    arrs = (ts.blocks, ts.tre_boxes, ts.mid_boxes, org, d, tn, tf)
    return _rowtrace2_cv(arrs, static)
