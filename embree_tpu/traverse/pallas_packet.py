"""Pallas TPU ray-packet traversal megakernel.

The production TPU path for the shared-stack packet traversal in
traverse/packet.py (which stays as the CPU / autodiff reference). Design,
in hardware terms (see /opt/skills/guides/pallas_guide.md):

  * A packet = DEFAULT_SUB*128 rays laid out as one (sub, 128) f32 VPU
    tile per component. All per-ray state (t, prim) are (sub, 128)
    tiles, so every box / triangle test is a handful of full-width VPU
    ops.
  * One node = one 128-lane f32 row of stride-W fields
    [lo_x[W] lo_y[W] lo_z[W] hi_x[W] hi_y[W] hi_z[W] child[W] count[W]]
    (child/count stored as exact small floats; exact below 2^24).
    Triangles pack 10 per row [v0 e1 e2 Ng]x10 (precomputed Moeller),
    pre-reordered into BVH leaf order so leaves are contiguous.
  * Mosaic cannot scalar-load VMEM at dynamic lane offsets, so each pop
    DMAs the node row VMEM->SMEM (~0.8us round trip measured on v5e) and
    reads scalars from SMEM — the TPU expression of embree's cached node
    fetch. Leaf hits DMA two triangle rows the same way. The traversal
    stack is a scalar SMEM array (bvh_intersector1.cpp:73-127 analog).
  * Children push via a W-wide sorting network (distance-descending so
    the nearest pops first) — branch-free traverseClosestHit
    (bvh_traverser1.h) — and popped subtrees whose entry distance beats
    every ray's best t are culled (pop-cull).
  * Per-packet ray-stat counters (pops, leaf tests) are emitted — the
    STAT3 analog (kernels/common/stat.h:22-33).

Grid = one program per packet; node/tri tables stay VMEM-resident across
packets when they fit (~12 MB => ~180k tris) and move to HBM above that
(every access is a row DMA either way, only fetch latency changes).

NOTE (axon): while-loop trip bounds must be runtime values (SMEM input);
constant bounds make Mosaic unroll and compile forever.
"""
from __future__ import annotations

import functools

import jax
import jax.core
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.rayhit import Hits, Rays
from ..core.stats import instance as _stat_instance, stats_enabled
from ..scene.prims import TrianglePrims
from .packet import _finalize_hits


def _record_stats(shadow: bool, rays: int, stats) -> None:
    """STAT3 accumulation (core/stats.py) — eager calls only; traced
    values can't be pulled to host."""
    if stats_enabled() and not isinstance(stats, jax.core.Tracer):
        _stat_instance().add(shadow, rays, stats)

DEFAULT_SUB = 64                # sublanes per packet tile (rays = SUB*128)
                                # (sub-sweep on v5e: 64 > 48 > 32 > 128 on
                                # the sorted 1M incoherent workload)
NT_PER_ROW = 10                 # tris per row (10 x 12 floats + 8 pad)
MAX_LEAF = 8                    # builder max_leaf_size must stay <= 11
# Shared-stack depth. The K-wide pop schedule is partly breadth-first,
# so the stack can far exceed the single-ray DFS bound (W-1)*maxDepth:
# round-5 hardware check caught the old 160-deep stack DROPPING pushes
# (~5% of hits lost at 2M rays / 1M prims). The pop width now adapts
# near the limit (see step()); the depth leaves (W-1)*2*(32+8) DFS
# headroom (embree maxDepth, bvh.h:135-137) above the adaptive band,
# making overflow unreachable; an overflow counter is emitted and gated
# in tests regardless.
STACK_DEPTH = 1024
ROBUST_MIN = np.float32(1.0 - 3.0 * 2.0 ** -23)
ROBUST_MAX = np.float32(1.0 + 3.0 * 2.0 ** -23)
INF = np.float32(np.inf)


@jax.tree_util.register_pytree_node_class
class PallasScene:
    """VMEM-packed accel produced at commit time.

    num_nodes/num_prims/width are STATIC aux data (python ints) so the
    kernel variant (node width, leaf layout) can be selected inside a
    caller's jit trace."""

    def __init__(self, nodes, tdata, bvh_to_orig, num_nodes, num_prims,
                 width=4):
        self.nodes = nodes           # (M, 128) f32 node rows
        self.tdata = tdata           # (ceil(T/10)+1, 128) f32 leaf rows
        self.bvh_to_orig = bvh_to_orig  # (T,) i32 BVH slot -> orig prim
        self.num_nodes = num_nodes
        self.num_prims = num_prims
        self.width = width

    def tree_flatten(self):
        return ((self.nodes, self.tdata, self.bvh_to_orig),
                (self.num_nodes, self.num_prims, self.width))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def vmem_bytes(self) -> int:
        return 4 * 128 * (self.nodes.shape[0] + self.tdata.shape[0])


def pack_scene(bvh, tris, host_tris=None) -> PallasScene:
    """Repack builder output into the kernel's 128-lane row layout.

    Works for any node width W <= 16 (BVH4 and BVH8 in practice): the
    row is 8 stride-W fields [lo_x lo_y lo_z hi_x hi_y hi_z child count].

    Pass the HOST-side builder output (BVHArraysNP) and `host_tris`
    (v0, v1, v2 numpy arrays) when available: np.asarray on device
    arrays is a device->host pull, which is catastrophically slow over
    the axon tunnel (~350 s at 500k prims, measured)."""
    lower = np.asarray(bvh.lower)    # (M, W, 3)
    upper = np.asarray(bvh.upper)
    child = np.asarray(bvh.child)    # (M, W)
    count = np.asarray(bvh.count)
    order = np.asarray(bvh.prim_order)
    M, W = child.shape

    rows = np.zeros((M, 128), np.float32)
    for a in range(3):
        rows[:, W * a: W * a + W] = lower[:, :, a]
        rows[:, W * (3 + a): W * (3 + a) + W] = upper[:, :, a]
    rows[:, 6 * W: 7 * W] = child.astype(np.float32)
    rows[:, 7 * W: 8 * W] = count.astype(np.float32)

    # triangles in BVH order, 10 per row, +1 pad row so a leaf's 2-row DMA
    # never runs off the end
    T = order.shape[0]
    if T:
        if host_tris is not None:
            hv0, hv1, hv2 = host_tris
        else:
            hv0, hv1, hv2 = (np.asarray(tris.v0), np.asarray(tris.v1),
                             np.asarray(tris.v2))
        v0 = hv0[order]
        v1 = hv1[order]
        v2 = hv2[order]
    else:
        v0 = v1 = v2 = np.zeros((0, 3), np.float32)
    # precomputed Moeller layout per prim: [v0 e1 e2 Ng] with e1 = v0-v1,
    # e2 = v2-v0, Ng = cross(e2, e1) — embree Triangle4's v0/e1/e2
    # precompute (triangle.h), saves 15 full-tile vector ops per leaf test
    td = np.zeros((max(T, 1), 12), np.float32)
    if T:
        e1 = v0 - v1
        e2 = v2 - v0
        td[:, 0:3] = v0
        td[:, 3:6] = e1
        td[:, 6:9] = e2
        td[:, 9:12] = np.cross(e2, e1)
    nrow = -(-td.shape[0] // NT_PER_ROW)
    pad_prims = nrow * NT_PER_ROW - td.shape[0]
    td = np.concatenate([td, np.zeros((pad_prims, 12), np.float32)])
    tdata = np.pad(td.reshape(nrow, NT_PER_ROW * 12),
                   ((0, 1), (0, 128 - NT_PER_ROW * 12)))

    return PallasScene(
        nodes=jnp.asarray(rows),
        tdata=jnp.asarray(tdata),
        bvh_to_orig=jnp.asarray(order, jnp.int32),
        num_nodes=M,
        num_prims=T,
        width=W,
    )


def _rcp_safe(a):
    return jnp.where(jnp.abs(a) < 1e-30, jnp.where(a < 0, -1e30, 1e30), 1.0 / a)


SENT = np.int32(-2 ** 31)       # empty-stack-slot sentinel



_BLOCK_BUCKETS = (1, 4, 16, 64, 128, 256, 1024, 4096)


def _bucket_blocks(nb: int) -> int:
    """Quantize packet count so only a handful of grid sizes ever compile
    (each distinct grid is a separate — slow, remote — Mosaic compile on
    axon). Padded packets cost ~1 pop each (tfar=-inf kills traversal)."""
    for b in _BLOCK_BUCKETS:
        if nb <= b:
            return b
    return -(-nb // _BLOCK_BUCKETS[-1]) * _BLOCK_BUCKETS[-1]


def _ray_tiles(rays: Rays, sub: int = DEFAULT_SUB):
    """Flatten + pad rays to (B*sub, 128) per-component tiles."""
    rpp = sub * 128
    org = rays.org.reshape(-1, 3)
    d = rays.dir.reshape(-1, 3)
    tn = rays.tnear.reshape(-1)
    tf = rays.tfar.reshape(-1)
    R = tn.shape[0]
    Rp = _bucket_blocks(-(-R // rpp)) * rpp
    pad = Rp - R

    def pc(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]).reshape(-1, 128)

    tiles = (pc(org[:, 0], 0.0), pc(org[:, 1], 0.0), pc(org[:, 2], 0.0),
             pc(d[:, 0], 1.0), pc(d[:, 1], 0.0), pc(d[:, 2], 0.0),
             pc(tn, 0.0), pc(tf, -np.inf))
    return tiles, R, Rp // rpp



# distance-sorting networks per node width (4: 5 comparators; 8: Batcher
# odd-even mergesort, 19 comparators) — branch-free traverseClosestHit
_SORT_NETS = {
    4: ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)),
    8: ((0, 1), (2, 3), (4, 5), (6, 7),
        (0, 2), (1, 3), (4, 6), (5, 7),
        (1, 2), (5, 6),
        (0, 4), (1, 5), (2, 6), (3, 7),
        (2, 4), (3, 5),
        (1, 2), (3, 4), (5, 6)),
}


def _tri_leaf_test(ctx, fld, p, t, prim, occluded: bool, cull: bool):
    """Precomputed-Moeller triangle leaf (triangle_intersector_moeller.h
    :69-130); fld = the 12 packed floats [v0 e1 e2 Ng]."""
    o_x, o_y, o_z = ctx["o"]
    d_x, d_y, d_z = ctx["d"]
    tnear = ctx["tnear"]
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, ngx, ngy, ngz = fld
    cx = v0x - o_x; cy = v0y - o_y; cz = v0z - o_z
    rx = cy * d_z - cz * d_y
    ry = cz * d_x - cx * d_z
    rz = cx * d_y - cy * d_x
    den = ngx * d_x + ngy * d_y + ngz * d_z
    absden = jnp.abs(den)
    sgn = jnp.where(den >= 0.0, 1.0, -1.0)
    u_s = (rx * e2x + ry * e2y + rz * e2z) * sgn
    v_s = (rx * e1x + ry * e1y + rz * e1z) * sgn
    t_s = (ngx * cx + ngy * cy + ngz * cz) * sgn
    # EMBREE_BACKFACE_CULLING variant: front-facing only
    front = (den < 0.0) if cull else (den != 0.0)
    ok = front & (u_s >= 0.0) & (v_s >= 0.0) \
        & (u_s + v_s <= absden) \
        & (absden * tnear < t_s) & (t_s <= absden * t)
    if occluded:
        return jnp.where(ok, -INF, t), prim
    t_hit = t_s / jnp.maximum(absden, 1e-37)
    return jnp.where(ok, t_hit, t), jnp.where(ok, p, prim)


# leaf variant registry: name -> (floats per prim, prims per row, test)
# — the PrimitiveType vtable analog (kernels/common/primitive.h)
LEAF_VARIANTS = {"tri": (12, NT_PER_ROW, _tri_leaf_test)}


def _traversal_kernel_v3(occluded: bool, sub: int = DEFAULT_SUB,
                         K: int = 4, width: int = 4, cull: bool = False,
                         leaf: str = "tri"):
    """v3 kernel: unified node/leaf stack + K-wide pops.

    v1/v2 profiling on v5e shows per-pop cost is the serial chain
    (DMA wait -> 4 cross-lane reductions -> scalar pushes), not VPU
    throughput.  v3 pops up to K stack refs per iteration, launches all
    their row DMAs back-to-back, then processes them in sequence: the
    DMA latency is paid once per iteration (amortized K ways) and the
    4*K reductions issue as independent chains the VPU can pipeline.
    Leaves ride the stack as tagged refs (embree NodeRef, bvh.h:118-141)
    so leaf rows batch the same way.

    `leaf` selects the typed-leaf test from LEAF_VARIANTS ("tri", or the
    hair "cone"/"ribbon" variants registered by traverse/pallas_hair) —
    the TPU expression of the reference's per-primitive intersector
    tables (accel.h Intersector1, primitive.h vtable)."""
    NF, NTR, leaf_test = LEAF_VARIANTS[leaf]

    def kernel(params, nodes, tdata,
               ox, oy, oz, dx, dy, dz, tn, tf,
               t_out, prim_out, stats_out,
               stack, dstack, nrow, lbuf, nsem, lsem):
        max_iters = params[0]
        rdx = _rcp_safe(dx[:]); rdy = _rcp_safe(dy[:]); rdz = _rcp_safe(dz[:])
        orx = ox[:] * rdx; ory = oy[:] * rdy; orz = oz[:] * rdz
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        tnear = tn[:]
        ctx = {"o": (o_x, o_y, o_z), "d": (d_x, d_y, d_z),
               "rd": (rdx, rdy, rdz), "tnear": tnear}

        def node_dma(i, node):
            return pltpu.make_async_copy(nodes.at[node], nrow.at[i],
                                         nsem.at[i])

        def leaf_dma(i, row):
            return pltpu.make_async_copy(tdata.at[pl.ds(row, 2)],
                                         lbuf.at[i], lsem.at[i])

        def start_ref(i, ref):
            @pl.when(ref >= 0)
            def _():
                node_dma(i, ref).start()

            @pl.when((ref < 0) & (ref != SENT))
            def _():
                v = -ref - 1
                leaf_dma(i, (v >> 4) // NTR).start()

        def wait_ref(i, ref):
            @pl.when(ref >= 0)
            def _():
                node_dma(i, ref).wait()

            @pl.when((ref < 0) & (ref != SENT))
            def _():
                v = -ref - 1
                leaf_dma(i, (v >> 4) // NTR).wait()

        def mt_leaf(i, ref, t, prim):
            v = -ref - 1
            start = v >> 4
            cnt = v & 15
            row = start // NTR

            def body(k, carry):
                t, prim = carry
                p = start + k
                rr = p // NTR - row
                tc = (p % NTR) * NF
                fld = [lbuf[i, rr, tc + j] for j in range(NF)]
                return leaf_test(ctx, fld, p, t, prim, occluded, cull)

            return jax.lax.fori_loop(0, jnp.minimum(cnt, MAX_LEAF), body,
                                     (t, prim))

        W = width

        def process_node(i, t, prim, sp, drops):
            keys, refs, pushes = [], [], []
            for c in range(W):
                lox = nrow[i, 0 * W + c]; loy = nrow[i, 1 * W + c]
                loz = nrow[i, 2 * W + c]
                hix = nrow[i, 3 * W + c]; hiy = nrow[i, 4 * W + c]
                hiz = nrow[i, 5 * W + c]
                tx0 = lox * rdx - orx; tx1 = hix * rdx - orx
                ty0 = loy * rdy - ory; ty1 = hiy * rdy - ory
                tz0 = loz * rdz - orz; tz1 = hiz * rdz - orz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                               jnp.minimum(ty0, ty1)),
                                   jnp.minimum(tz0, tz1)) * ROBUST_MIN
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                               jnp.maximum(ty0, ty1)),
                                   jnp.maximum(tz0, tz1)) * ROBUST_MAX
                tmin = jnp.maximum(tmin, tnear)
                hitm = (tmin <= tmax) & (tmin <= t)
                dist = jnp.min(jnp.where(hitm, tmin, INF))
                cc = nrow[i, 6 * W + c].astype(jnp.int32)
                cnt = nrow[i, 7 * W + c].astype(jnp.int32)
                ok = (dist < INF) & (cnt >= 0)
                ref = jnp.where(cnt > 0, -(((cc << 4) | cnt) + 1), cc)
                keys.append(jnp.where(ok, dist, -INF))
                refs.append(ref)
                pushes.append(ok)
            for (a, b) in _SORT_NETS[W]:
                swap = keys[a] < keys[b]
                keys[a], keys[b] = (jnp.where(swap, keys[b], keys[a]),
                                    jnp.where(swap, keys[a], keys[b]))
                refs[a], refs[b] = (jnp.where(swap, refs[b], refs[a]),
                                    jnp.where(swap, refs[a], refs[b]))
                pushes[a], pushes[b] = (
                    jnp.where(swap, pushes[b], pushes[a]),
                    jnp.where(swap, pushes[a], pushes[b]))
            depth_limit = STACK_DEPTH if W <= 4 else STACK_DEPTH * 2
            for k in range(W):
                sp_k = sp
                # overflow guard: drop pushes past the scratch depth —
                # unreachable under the adaptive pop width (step()), and
                # COUNTED so tests can gate on zero drops (a dropped
                # push is a silently lost hit)
                can = pushes[k] & (sp_k < depth_limit)

                @pl.when(can)
                def _(sp_k=sp_k, k=k):
                    stack[sp_k] = refs[k]
                    dstack[sp_k] = keys[k]

                sp = sp + can.astype(jnp.int32)
                drops = drops + (pushes[k] & ~can).astype(jnp.int32)
            return t, prim, sp, drops

        # adaptive pop width: K-wide pops push up to K*W refs per
        # iteration, so near the depth limit the schedule narrows to
        # single-pop DFS, whose residual growth is bounded by
        # (W-1)*maxDepth — together with the headroom below, the stack
        # provably cannot overflow (the r5 fix for the 160-deep stack
        # silently dropping pushes at benchmark scale)
        depth_limit = STACK_DEPTH if W <= 4 else STACK_DEPTH * 2
        eff_depth = depth_limit - ((W - 1) * 80 + K * W)

        def step(carry):
            sp, t, prim, iters, npops, ltests, drops = carry
            # pop-cull (bvh_intersector1.cpp:83-88): a stacked subtree
            # whose entry distance exceeds every ray's current best t
            # cannot improve any hit — skip it (fires on coherent all-hit
            # packets; t stays +inf for missing rays, so incoherent
            # packets pay only the max-reduction)
            tmax_cur = jnp.max(t)
            npop = jnp.minimum(jnp.minimum(sp, K),
                               jnp.maximum(1, (eff_depth - sp) // W))
            refs = []
            for i in range(K):
                idx = jnp.maximum(sp - 1 - i, 0)
                d = dstack[idx]
                keep = (i < npop) & (d <= tmax_cur)
                r = jnp.where(keep, stack[idx], SENT)
                refs.append(r)
                start_ref(i, r)
            sp = sp - npop
            for i in range(K):
                wait_ref(i, refs[i])
                is_node = refs[i] >= 0
                is_leaf = (refs[i] < 0) & (refs[i] != SENT)
                t, prim, sp, drops = jax.lax.cond(
                    is_node,
                    lambda a, i=i: process_node(i, *a),
                    lambda a: a, (t, prim, sp, drops))
                t, prim = jax.lax.cond(
                    is_leaf,
                    lambda tp, i=i: mt_leaf(i, refs[i], *tp),
                    lambda tp: tp, (t, prim))
                # STAT3 semantics (stat.h:22-33): trav_nodes = real node
                # pops, trav_leaves-style counter = per-leaf prim tests
                npops = npops + is_node.astype(jnp.int32)
                ltests = ltests + jnp.where(is_leaf,
                                            (-refs[i] - 1) & 15, 0)
            return sp, t, prim, iters + 1, npops, ltests, drops

        if occluded:
            def cond(carry):
                live = jnp.max(carry[1]) > -INF
                return (carry[0] > 0) & live & (carry[3] < max_iters)
        else:
            def cond(carry):
                return (carry[0] > 0) & (carry[3] < max_iters)

        stack[0] = 0  # root
        dstack[0] = -INF
        prim0 = jnp.full((sub, 128), -1, jnp.int32)
        sp, t, prim, iters, npops, ltests, drops = jax.lax.while_loop(
            cond, step,
            (jnp.int32(1), tf[:], prim0, jnp.int32(0), jnp.int32(0),
             jnp.int32(0), jnp.int32(0)))

        t_out[:] = t
        prim_out[:] = prim
        bid = pl.program_id(0)
        stats_out[bid, 0] = npops
        stats_out[bid, 1] = ltests
        stats_out[bid, 2] = drops

    return kernel


def _pallas_call_v3(occluded: bool, num_blocks: int, interpret: bool,
                    sub: int = DEFAULT_SUB, tables_in_hbm: bool = False,
                    K: int = 4, width: int = 4, cull: bool = False,
                    leaf: str = "tri"):
    table_spec = pl.BlockSpec(memory_space=pltpu.ANY if tables_in_hbm
                              else pltpu.VMEM)
    tile = (sub, 128)
    ray_spec = pl.BlockSpec(tile, lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _traversal_kernel_v3(occluded, sub, K, width, cull, leaf),
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  table_spec, table_spec] + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((num_blocks * sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((num_blocks, 3), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH if width <= 4 else STACK_DEPTH * 2,),
                       jnp.int32),
            pltpu.SMEM((STACK_DEPTH if width <= 4 else STACK_DEPTH * 2,),
                       jnp.float32),
            pltpu.SMEM((K, 128), jnp.float32),
            pltpu.SMEM((K, 2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((K,)),
            pltpu.SemaphoreType.DMA((K,)),
        ],
        interpret=interpret,
    )



VMEM_TABLE_BUDGET = 12 * 1024 * 1024


POP_WIDTH = 16  # v3 kernel multi-pop width (sweep-tuned on v5e)


@functools.partial(jax.jit,
                   static_argnames=("num_blocks", "interpret", "sub", "cull"))
def _run_intersect(ps: PallasScene, tiles, num_blocks: int, interpret=False,
                   sub: int = DEFAULT_SUB, cull: bool = False):
    params = jnp.asarray([262144], jnp.int32)
    hbm = ps.vmem_bytes > VMEM_TABLE_BUDGET
    return _pallas_call_v3(False, num_blocks, interpret, sub, hbm,
                           POP_WIDTH, ps.width, cull)(
        params, ps.nodes, ps.tdata, *tiles)


@functools.partial(jax.jit,
                   static_argnames=("num_blocks", "interpret", "sub", "cull"))
def _run_occluded(ps: PallasScene, tiles, num_blocks: int, interpret=False,
                  sub: int = DEFAULT_SUB, cull: bool = False):
    params = jnp.asarray([262144], jnp.int32)
    hbm = ps.vmem_bytes > VMEM_TABLE_BUDGET
    return _pallas_call_v3(True, num_blocks, interpret, sub, hbm,
                           POP_WIDTH, ps.width, cull)(
        params, ps.nodes, ps.tdata, *tiles)


@functools.partial(jax.jit, static_argnames=("R",))
def _finalize_pallas(ps, tris, rays, t_o, prim_o, R: int):
    t = t_o.reshape(-1)[:R]
    prim_bvh = prim_o.reshape(-1)[:R]
    prim = jnp.where(prim_bvh >= 0,
                     ps.bvh_to_orig[jnp.maximum(prim_bvh, 0)], -1)
    flat = Rays(rays.org.reshape(-1, 3), rays.dir.reshape(-1, 3),
                rays.tnear.reshape(-1), rays.tfar.reshape(-1))
    hits = _finalize_hits(tris, flat, t, prim)
    shape = rays.batch_shape
    return jax.tree.map(lambda x: x.reshape(shape + x.shape[1:]), hits)


def intersect_pallas(ps: PallasScene, tris: TrianglePrims, rays: Rays,
                     interpret: bool = False, cull: bool = False) -> Hits:
    """Closest hit via the pallas kernel; u/v/Ng finalized outside (the
    differentiable hit re-evaluation)."""
    tiles, R, nb = _ray_tiles(rays, DEFAULT_SUB)
    t_o, prim_o, _stats = _run_intersect(ps, tiles, nb, interpret,
                                         DEFAULT_SUB, cull)
    _record_stats(False, R, _stats)
    return _finalize_pallas(ps, tris, rays, t_o, prim_o, R)


def intersect_pallas_raw(ps: PallasScene, rays: Rays,
                         interpret: bool = False, cull: bool = False):
    """Kernel-only entry: returns flat (t, prim) in ORIGINAL prim ids,
    without hit finalization. Lets the sorted stream path unsort just two
    arrays (TPU gathers are expensive) and finalize against the unsorted
    rays."""
    tiles, R, nb = _ray_tiles(rays, DEFAULT_SUB)
    t_o, prim_o, _stats = _run_intersect(ps, tiles, nb, interpret,
                                         DEFAULT_SUB, cull)
    _record_stats(False, R, _stats)
    t = t_o.reshape(-1)[:R]
    prim_bvh = prim_o.reshape(-1)[:R]
    prim = jnp.where(prim_bvh >= 0,
                     ps.bvh_to_orig[jnp.maximum(prim_bvh, 0)], -1)
    return t, prim


def occluded_pallas(ps: PallasScene, rays: Rays,
                    interpret: bool = False,
                    cull: bool = False) -> jnp.ndarray:
    tiles, R, nb = _ray_tiles(rays, DEFAULT_SUB)
    t_o, _prim, _stats = _run_occluded(ps, tiles, nb, interpret, DEFAULT_SUB,
                                       cull)
    _record_stats(True, R, _stats)
    occ = (t_o.reshape(-1)[:R] == -np.inf)
    return occ.reshape(rays.batch_shape)


def traversal_stats(ps: PallasScene, rays: Rays, interpret: bool = False):
    """STAT3 analog: per-packet (pops, leaf_tests) counters."""
    tiles, _R, nb = _ray_tiles(rays, DEFAULT_SUB)
    _t, _p, stats = _run_intersect(ps, tiles, nb, interpret, DEFAULT_SUB)
    return np.asarray(stats)
