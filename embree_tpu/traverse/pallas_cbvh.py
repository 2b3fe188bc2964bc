"""Pallas TPU kernel for compressed-patch (cBVH) traversal.

The hardware path for traverse/cbvh.py (which remains the CPU/reference
implementation). Layout strategy:

  * one tile = THREE 128-lane rows, DMA'd VMEM->SMEM ONCE per tile entry,
    after which the entire quadtree walk runs from SMEM scalars with no
    further memory traffic:
      header row (f32): space 9 | proj 9 | iproj 9 | frustum 10 | uv0 2 |
                        uvd 2 | extent 1 | geom 1 | prim 1  (35 used)
      node row (i32):   up to 85 4-byte 'com' node words
                        (xz | x<<8 | yz<<16 | y<<24)
      leaf row (i32):   2 pizza-box cells per word (z12|z34<<8 each) —
                        256 cells == exactly 128 lanes ('leaf' mode)
      grid rows (f32):  (g+1)^2*3 local floats, 8 rows ('grid' mode)
  * quantization lookup tables ride in the scalar params input (SMEM),
    indexed dynamically — SMEM is the only memory with free dynamic
    scalar indexing on TPU (Mosaic restriction).
  * the top-level BVH walk is the same shared-stack scheme as
    pallas_packet.py; a tile leaf runs the quadtree walk as a nested
    while loop with node-index + parent-box stacks in SMEM.
  * per-ray state (projected ray, local tfar, hit u/v/tile) are (8, 128)
    VPU tiles; the decompressed child boxes are ray-independent scalars
    broadcast into the slab tests — the same packet principle as the
    outer kernel.

Mode support: 'box' and 'leaf' (the paper's production modes) and 'grid';
'full' (96-byte reference nodes) stays on the XLA path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..build.cbvh import (TABLE_BORDER, TABLE_MID, TABLE_Z, CompressedTiles,
                          morton2_decode)
from .cbvh import CompressedAccel, _CHit
from .pallas_packet import VMEM_TABLE_BUDGET, _ray_tiles, _rcp_safe

CSUB = 8     # (8,128) ray packets: sublane minimum; tighter per-packet
             # pop/tile-entry unions beat DMA amortization for the cbvh
             # walk (32->8 measured 2.86->3.32 fps on bomberman)
TILE = (CSUB, 128)

ROBUST_MIN = np.float32(1.0 - 3.0 * 2.0 ** -23)
ROBUST_MAX = np.float32(1.0 + 3.0 * 2.0 ** -23)
INF = np.float32(np.inf)
G_EPS = np.float32(1e-4)
QDEPTH = 24          # quadtree stacks (cl<=4 -> depth 4, 3 pushes/pop)
# top-level stack: deep enough for the K-wide (partly breadth-first)
# pop schedule plus DFS headroom; the adaptive pop width in step()
# keeps it from overflowing (same scheme as pallas_packet r5)
STACK_DEPTH = 1024
POP_K = 8            # refs popped per iteration (batched DMA starts)
SENT = np.int32(-2 ** 31)


@jax.tree_util.register_pytree_node_class
class PallasCompressed:
    """Kernel-packed compressed accel; comp_level/mode are static aux."""

    _ARRAYS = ("topnodes", "theader", "tnodes", "tleaf", "tgrid",
               "tile_of_leaf", "geom_id", "prim_id", "uv0", "uvd")

    def __init__(self, topnodes, theader, tnodes, tleaf, tgrid, tile_of_leaf,
                 geom_id, prim_id, uv0, uvd, comp_level, mode):
        self.topnodes = topnodes        # (M, 128) f32 top-level node rows
        self.theader = theader          # (T, 128) f32
        self.tnodes = tnodes            # (T, 128) i32
        self.tleaf = tleaf              # (T, 128) i32
        self.tgrid = tgrid              # (T, 8, 128) f32
        self.tile_of_leaf = tile_of_leaf  # (T,) i32 prim_order mapping
        self.geom_id = geom_id
        self.prim_id = prim_id
        self.uv0 = uv0
        self.uvd = uvd
        self.comp_level = comp_level
        self.mode = mode

    @property
    def vmem_bytes(self):
        return 4 * 128 * (self.topnodes.shape[0] + self.theader.shape[0]
                          + self.tnodes.shape[0] + self.tleaf.shape[0]
                          + self.tgrid.shape[0] * 8)

    def tree_flatten(self):
        return ([getattr(self, k) for k in self._ARRAYS],
                (self.comp_level, self.mode))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, comp_level=aux[0], mode=aux[1])


def pack_compressed(accel: CompressedAccel) -> PallasCompressed | None:
    """Repack the compressed accel for the kernel; None if unsupported."""
    tiles = accel.tiles
    if tiles.mode not in ("box", "leaf", "grid"):
        return None
    cl = tiles.comp_level
    g = 1 << cl
    n_nodes = (4 ** cl - 1) // 3
    if n_nodes > 128 or (g * g) // 2 > 128:
        return None
    T = tiles.num_tiles

    top = accel.top
    lower = np.asarray(top.lower)
    upper = np.asarray(top.upper)
    child = np.asarray(top.child)
    count = np.asarray(top.count)
    M = lower.shape[0]
    rows = np.zeros((M, 128), np.float32)
    for a in range(3):
        rows[:, 4 * a: 4 * a + 4] = lower[:, :, a]
        rows[:, 12 + 4 * a: 12 + 4 * a + 4] = upper[:, :, a]
    rows[:, 24:28] = child.astype(np.float32)
    rows[:, 28:32] = count.astype(np.float32)

    hdr = np.zeros((T, 128), np.float32)
    hdr[:, 0:9] = np.asarray(tiles.space).reshape(T, 9)
    hdr[:, 9:18] = np.asarray(tiles.proj).reshape(T, 9)
    hdr[:, 18:27] = np.asarray(tiles.iproj).reshape(T, 9)
    hdr[:, 27:37] = np.asarray(tiles.frustum)
    hdr[:, 37:39] = np.asarray(tiles.uv0)
    hdr[:, 39:41] = np.asarray(tiles.uvd)
    hdr[:, 41] = np.asarray(tiles.extent)
    hdr[:, 42] = np.asarray(tiles.geom_id).astype(np.float32)
    hdr[:, 43] = np.asarray(tiles.prim_id).astype(np.float32)

    nd = np.asarray(tiles.nodes).astype(np.int64)  # (T, n_nodes, 4)
    words = (nd[:, :, 0] | (nd[:, :, 1] << 8) | (nd[:, :, 2] << 16)
             | (nd[:, :, 3] << 24)).astype(np.uint32)
    tn = np.zeros((T, 128), np.uint32)
    tn[:, :words.shape[1]] = words

    tl = np.zeros((T, 128), np.uint32)
    if tiles.mode == "leaf":
        lz = np.asarray(tiles.leaf_z).astype(np.int64)  # (T, cells, 2)
        cells = lz.shape[1]
        cw = (lz[:, :, 0] | (lz[:, :, 1] << 8)).astype(np.uint32)
        if cells % 2 == 1:
            cw = np.concatenate([cw, np.zeros((T, 1), np.uint32)], 1)
        packed = cw[:, 0::2] | (cw[:, 1::2] << 16)
        tl[:, :packed.shape[1]] = packed

    tg = np.zeros((T, 8, 128), np.float32)
    if tiles.mode == "grid":
        gr = np.asarray(tiles.grid).reshape(T, -1)  # (T, (g+1)^2*3), i-major
        assert gr.shape[1] <= 8 * 128
        tg[:, :, :].reshape(T, -1)[:, :gr.shape[1]] = gr

    return PallasCompressed(
        topnodes=jnp.asarray(rows),
        theader=jnp.asarray(hdr),
        tnodes=jnp.asarray(tn.view(np.int32)),
        tleaf=jnp.asarray(tl.view(np.int32)),
        tgrid=jnp.asarray(tg),
        tile_of_leaf=jnp.asarray(np.asarray(top.prim_order), jnp.int32),
        geom_id=tiles.geom_id,
        prim_id=tiles.prim_id,
        uv0=tiles.uv0,
        uvd=tiles.uvd,
        comp_level=cl,
        mode=tiles.mode,
    )


def _make_kernel(mode: str, cl: int, K: int = POP_K):
    g = 1 << cl
    cells = g * g
    elems = (4 ** cl - 1) // 3
    rcp_edges = np.float32(1.0 / g)
    mxs, mys = morton2_decode(np.arange(max(cells, 1), dtype=np.uint32))
    MX = tuple(int(v) for v in mxs)
    MY = tuple(int(v) for v in mys)
    # params layout: [0]=max_pops, [1:9]=border, [9:17]=mid, [17:21]=z
    PB, PM, PZ = 1, 9, 17

    def kernel(params, tidx, topnodes, theader, tnodes, tleaf, tgrid,
               ox, oy, oz, dx, dy, dz, tn_in, tf_in,
               t_out, u_out, v_out, tile_out, stats_out,
               stack, nrow, hbuf, nbuf, lbuf, gbuf,
               qstack, qboxes, nsem, hsem, tsem, lsem, gsem):
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        rdx = _rcp_safe(d_x); rdy = _rcp_safe(d_y); rdz = _rcp_safe(d_z)
        orx = o_x * rdx; ory = o_y * rdy; orz = o_z * rdz
        tnear = tn_in[:]
        max_pops = params[0].astype(jnp.int32)

        stack[0] = jnp.int32(0)

        # ---- K-wide ref schedule (r5): pop up to K refs per iteration,
        # start ALL their row DMAs back-to-back, process in sequence —
        # the per-pop serial DMA round trip was the bomberman frame's
        # dominant traversal cost (pallas_packet v3 scheme). A ref >= 0
        # is a top-level node; ref < 0 encodes tile -(ref+1).
        def start_ref(i, ref):
            @pl.when(ref >= 0)
            def _():
                pltpu.make_async_copy(topnodes.at[ref], nrow.at[i],
                                      nsem.at[i]).start()

            @pl.when((ref < 0) & (ref != SENT))
            def _():
                ti = -ref - 1
                pltpu.make_async_copy(theader.at[ti], hbuf.at[i],
                                      hsem.at[i]).start()
                pltpu.make_async_copy(tnodes.at[ti], nbuf.at[i],
                                      tsem.at[i]).start()
                if mode == "leaf":
                    pltpu.make_async_copy(tleaf.at[ti], lbuf.at[i],
                                          lsem.at[i]).start()
                if mode == "grid":
                    pltpu.make_async_copy(tgrid.at[ti], gbuf.at[i],
                                          gsem.at[i]).start()

        def wait_ref(i, ref):
            @pl.when(ref >= 0)
            def _():
                pltpu.make_async_copy(topnodes.at[ref], nrow.at[i],
                                      nsem.at[i]).wait()

            @pl.when((ref < 0) & (ref != SENT))
            def _():
                ti = -ref - 1
                pltpu.make_async_copy(theader.at[ti], hbuf.at[i],
                                      hsem.at[i]).wait()
                pltpu.make_async_copy(tnodes.at[ti], nbuf.at[i],
                                      tsem.at[i]).wait()
                if mode == "leaf":
                    pltpu.make_async_copy(tleaf.at[ti], lbuf.at[i],
                                          lsem.at[i]).wait()
                if mode == "grid":
                    pltpu.make_async_copy(tgrid.at[ti], gbuf.at[i],
                                          gsem.at[i]).wait()

        def tile_intersect(i, ti, t, u, v, tile):
            # ---- ray -> local frame (compressed.h:457-459) --------------
            def hb(j):
                return hbuf[i, j]
            lox = hb(0) * o_x + hb(1) * o_y + hb(2) * o_z
            loy = hb(3) * o_x + hb(4) * o_y + hb(5) * o_z
            loz = hb(6) * o_x + hb(7) * o_y + hb(8) * o_z
            ldx = hb(0) * d_x + hb(1) * d_y + hb(2) * d_z
            ldy = hb(3) * d_x + hb(4) * d_y + hb(5) * d_z
            ldz = hb(6) * d_x + hb(7) * d_y + hb(8) * d_z

            # ---- frustum entry (compressed_help.h:109-133) --------------
            rdz_l = _rcp_safe(ldz)
            t1z = hb(27) * rdz_l - loz * rdz_l
            t2z = hb(28) * rdz_l - loz * rdz_l

            def iline(p2x, p2y, p3x, p3y):
                vx = p2x - lox; vy = p2y - loy
                lx = p3x - p2x; ly = p3y - p2y
                den1 = ly * ldx - lx * ldy
                den1 = jnp.where(jnp.abs(den1) < 1e-30, 1e-30, den1)
                tt1 = (ly * vx - lx * vy) / den1
                tt2 = (ldx * vy - ldy * vx) / (-den1)
                ok = (tt2 >= 0.0) & (tt2 <= 1.0)
                return tt1, ok

            t1x, v1x = iline(hb(29), hb(30), hb(33), hb(34))
            t2x, v2x = iline(hb(31), hb(32), hb(35), hb(36))
            t1y, v1y = iline(hb(29), hb(30), hb(31), hb(32))
            t2y, v2y = iline(hb(33), hb(34), hb(35), hb(36))
            near1 = jnp.minimum(
                jnp.minimum(jnp.where(v1x, t1x, INF), jnp.where(v2x, t2x, INF)),
                jnp.minimum(jnp.where(v1y, t1y, INF), jnp.where(v2y, t2y, INF)))
            far1 = jnp.maximum(
                jnp.maximum(jnp.where(v1x, t1x, -INF), jnp.where(v2x, t2x, -INF)),
                jnp.maximum(jnp.where(v1y, t1y, -INF), jnp.where(v2y, t2y, -INF)))
            near = jnp.maximum(jnp.maximum(jnp.minimum(t1z, t2z), near1), tnear)
            far = jnp.minimum(jnp.minimum(jnp.maximum(t1z, t2z), far1), t)
            alive = (near <= far) & (v1x | v2x | v1y | v2y)

            # ---- projected ray (compressed.h:464-505) -------------------
            def proj_pt(px, py, pz):
                w = hb(15) * px + hb(16) * py + hb(17)
                w = jnp.where(jnp.abs(w) < 1e-30, 1e-30, w)
                return ((hb(9) * px + hb(10) * py + hb(11)) / w,
                        (hb(12) * px + hb(13) * py + hb(14)) / w, pz)

            e1x, e1y, e1z = proj_pt(lox + near * ldx, loy + near * ldy,
                                    loz + near * ldz)
            e2x, e2y, e2z = proj_pt(lox + far * ldx, loy + far * ldy,
                                    loz + far * ldz)
            dxx = e2x - e1x; dyy = e2y - e1y; dzz = e2z - e1z
            ax = jnp.abs(dxx); ay = jnp.abs(dyy); az = jnp.abs(dzz)
            tiny = (ax < G_EPS) & (ay < G_EPS) & (az < G_EPS)
            flat = (~tiny) & (az < G_EPS)
            dlen = jnp.sqrt(dxx * dxx + dyy * dyy + dzz * dzz)
            inv = 1.0 / jnp.maximum(dlen, 1e-30)
            sgnz = jnp.where(ldz >= 0, 1.0, -1.0)
            pdx = jnp.where(tiny, 0.0, dxx * inv)
            pdy = jnp.where(tiny, 0.0, dyy * inv)
            pdz = jnp.where(tiny, sgnz, dzz * inv)
            pox = e1x
            poy = e1y
            poz = jnp.where(tiny, e1z - sgnz, e1z)
            zf = jnp.where(tiny, jnp.float32(3.4e38),
                           ldz / jnp.where(jnp.abs(pdz) < 1e-30, 1e-30, pdz))
            tloc = jnp.where(tiny, jnp.float32(3.4e38),
                             jnp.where(flat, dlen, (t - near) * zf))
            tloc = jnp.where(alive, tloc, -INF)
            prdx = _rcp_safe(pdx); prdy = _rcp_safe(pdy); prdz = _rcp_safe(pdz)

            # ---- quadtree walk ------------------------------------------
            qstack[0] = jnp.int32(0)
            qboxes[0, 0] = jnp.float32(-1.0)
            qboxes[0, 1] = jnp.float32(-1.0)
            qboxes[0, 2] = hb(27)
            qboxes[0, 3] = jnp.float32(1.0)
            qboxes[0, 4] = jnp.float32(1.0)
            qboxes[0, 5] = hb(28)

            def world_t(th):
                # distance back to world space (:583-590, :648-656)
                px = pox + th * pdx; py = poy + th * pdy; pz = poz + th * pdz
                w = hb(24) * px + hb(25) * py + hb(26)
                w = jnp.where(jnp.abs(w) < 1e-30, 1e-30, w)
                ux = (hb(18) * px + hb(19) * py + hb(20)) / w
                uy = (hb(21) * px + hb(22) * py + hb(23)) / w
                fx = ux - lox; fy = uy - loy; fz = pz - loz
                flat_t = jnp.sqrt(fx * fx + fy * fy + fz * fz)
                return jnp.where(flat, flat_t, th / zf + near)

            def _qpop(carry):
                qsp, t, u, v, tile, tloc, qpops = carry
                qsp = qsp - 1
                curr = qstack[qsp]
                blx = qboxes[qsp, 0]; bly = qboxes[qsp, 1]; blz = qboxes[qsp, 2]
                bhx = qboxes[qsp, 3]; bhy = qboxes[qsp, 4]; bhz = qboxes[qsp, 5]

                def slab(lx, ly, lz, hx, hy, hz):
                    tx0 = lx * prdx - pox * prdx; tx1 = hx * prdx - pox * prdx
                    ty0 = ly * prdy - poy * prdy; ty1 = hy * prdy - poy * prdy
                    tz0 = lz * prdz - poz * prdz; tz1 = hz * prdz - poz * prdz
                    tmin = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1)) * ROBUST_MIN
                    tmax = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1)) * ROBUST_MAX
                    tmin = jnp.maximum(tmin, 0.0)
                    return tmin, tmax

                def do_leaf(args):
                    t, u, v, tile, tloc = args
                    idx = curr - elems
                    tmin, tmax = slab(blx, bly, blz, bhx, bhy, bhz)
                    box_ok = (tmin <= tmax) & (tmin <= tloc) & alive
                    # cell morton coords via SMEM-free switch: idx is traced;
                    # decode arithmetically (Compact1By1)
                    def compact(x):
                        x = x & 0x55555555
                        x = (x ^ (x >> 1)) & 0x33333333
                        x = (x ^ (x >> 2)) & 0x0F0F0F0F
                        x = (x ^ (x >> 4)) & 0x00FF00FF
                        return (x ^ (x >> 8)) & 0x0000FFFF
                    mx = compact(idx).astype(jnp.float32)
                    my = compact(idx >> 1).astype(jnp.float32)

                    if mode == "box":
                        dimx = jnp.maximum(bhx - blx, 1e-30)
                        dimy = jnp.maximum(bhy - bly, 1e-30)
                        cu = ((pox + pdx * tmin - blx) / dimx + mx) * rcp_edges
                        cv = ((poy + pdy * tmin - bly) / dimy + my) * rcp_edges
                        tw = world_t(tmin)
                        hit = box_ok
                        t = jnp.where(hit, tw, t)
                        u = jnp.where(hit, cu, u)
                        v = jnp.where(hit, cv, v)
                        tile = jnp.where(hit, ti, tile)
                        tloc = jnp.where(hit, tmin, tloc)
                    elif mode == "leaf":
                        word = lbuf[i, idx // 2].astype(jnp.uint32)
                        cw = jnp.where(idx % 2 == 0, word & 0xFFFF,
                                       word >> 16)
                        z12 = (cw & 0xFF).astype(jnp.int32)
                        z34 = ((cw >> 8) & 0xFF).astype(jnp.int32)
                        dimz = bhz - blz
                        ext = hb(41)
                        rng = (1.0 + 2.0 * ext) * dimz
                        off = blz - dimz * ext
                        rf = rng * (1.0 / 16.0)
                        z1 = off + rf * ((z12 >> 4) & 15).astype(jnp.float32)
                        z2 = off + rf * (z12 & 15).astype(jnp.float32)
                        z3 = off + rf * ((z34 >> 4) & 15).astype(jnp.float32)
                        z4 = off + rf * (z34 & 15).astype(jnp.float32)
                        dz = rf
                        p1x = pox + tmin * pdx; p1y = poy + tmin * pdy
                        p1z = poz + tmin * pdz
                        p2x = pox + tmax * pdx; p2y = poy + tmax * pdy
                        p2z = poz + tmax * pdz
                        lenx = 1.0 / jnp.maximum(bhx - blx, 1e-30)
                        leny = 1.0 / jnp.maximum(bhy - bly, 1e-30)
                        fx1 = (p1x - blx) * lenx; fy1 = (p1y - bly) * leny
                        fx2 = (p2x - blx) * lenx; fy2 = (p2y - bly) * leny
                        degen = (tmax - tmin) < 1e-6
                        za1 = z1 * (1 - fx1) * (1 - fy1) + z2 * fx1 * (1 - fy1) \
                            + z3 * (1 - fx1) * fy1 + z4 * fx1 * fy1
                        za2 = z1 * (1 - fx2) * (1 - fy2) + z2 * fx2 * (1 - fy2) \
                            + z3 * (1 - fx2) * fy2 + z4 * fx2 * fy2
                        between = (p1z >= za1) & (p1z <= za1 + dz)
                        above = p1z > za1 + dz
                        z1s = jnp.where(above, za1 + dz, za1)
                        z2s = jnp.where(above, za2 + dz, za2)
                        alpha = p2z - z2s
                        beta = z1s - p1z
                        den = jnp.where(jnp.abs(alpha + beta) < 1e-30, 1e-30,
                                        alpha + beta)
                        tsec = (tmin * alpha + tmax * beta) / den
                        dfr = (tsec - tmin) / jnp.maximum(tmax - tmin, 1e-30)
                        sec_ok = (tsec < tloc) & (tsec >= tmin) & (tsec <= tmax)
                        th = jnp.where(degen | between, tmin, tsec)
                        hit = box_ok & (degen | between | sec_ok)
                        fxh = jnp.where(degen | between, fx1,
                                        fx1 + (fx2 - fx1) * dfr)
                        fyh = jnp.where(degen | between, fy1,
                                        fy1 + (fy2 - fy1) * dfr)
                        cu = (fxh + mx) * rcp_edges
                        cv = (fyh + my) * rcp_edges
                        tw = world_t(th)
                        t = jnp.where(hit, tw, t)
                        u = jnp.where(hit, cu, u)
                        v = jnp.where(hit, cv, v)
                        tile = jnp.where(hit, ti, tile)
                        tloc = jnp.where(hit, th, tloc)
                    else:  # grid: two local-frame triangles from gbuf
                        imx = compact(idx)
                        imy = compact(idx >> 1)

                        def vtx(ii, jj):
                            base = 3 * (ii * (g + 1) + jj)
                            return (gbuf[i, base // 128, base % 128],
                                    gbuf[i, (base + 1) // 128,
                                         (base + 1) % 128],
                                    gbuf[i, (base + 2) // 128,
                                         (base + 2) % 128])

                        # NOTE: grid rows store WORLD vertices; intersect the
                        # WORLD ray (compressed.h:591-610)
                        v0 = vtx(imx, imy)
                        v1 = vtx(imx + 1, imy)
                        v2 = vtx(imx, imy + 1)
                        v3 = vtx(imx + 1, imy + 1)

                        def mt(a, b, c):
                            e1xx = a[0] - b[0]; e1yy = a[1] - b[1]; e1zz = a[2] - b[2]
                            e2xx = c[0] - a[0]; e2yy = c[1] - a[1]; e2zz = c[2] - a[2]
                            ngx = e2yy * e1zz - e2zz * e1yy
                            ngy = e2zz * e1xx - e2xx * e1zz
                            ngz = e2xx * e1yy - e2yy * e1xx
                            cx = a[0] - o_x; cy = a[1] - o_y; cz = a[2] - o_z
                            rx = cy * d_z - cz * d_y
                            ry = cz * d_x - cx * d_z
                            rz = cx * d_y - cy * d_x
                            dn = ngx * d_x + ngy * d_y + ngz * d_z
                            absdn = jnp.abs(dn)
                            sg = jnp.where(dn >= 0, 1.0, -1.0)
                            uu = (rx * e2xx + ry * e2yy + rz * e2zz) * sg
                            vv = (rx * e1xx + ry * e1yy + rz * e1zz) * sg
                            tt = (ngx * cx + ngy * cy + ngz * cz) * sg
                            ok = (dn != 0) & (uu >= 0) & (vv >= 0) \
                                & (uu + vv <= absdn) & (absdn * tnear < tt) \
                                & (tt <= absdn * t)
                            r = 1.0 / jnp.maximum(absdn, 1e-37)
                            return ok, tt * r, uu * r, vv * r
                        ok1, t1, u1, vv1 = mt(v0, v1, v2)
                        ok2, t2, u2, vv2 = mt(v3, v2, v1)
                        use2 = ok2 & (~ok1 | (t2 < t1))
                        okg = (ok1 | ok2) & alive
                        tg_ = jnp.where(use2, t2, t1)
                        ug = jnp.where(use2,
                                       (imx.astype(jnp.float32) + 1.0 - u2),
                                       (imx.astype(jnp.float32) + u1)) * rcp_edges
                        vg = jnp.where(use2,
                                       (imy.astype(jnp.float32) + 1.0 - vv2),
                                       (imy.astype(jnp.float32) + vv1)) * rcp_edges
                        t = jnp.where(okg, tg_, t)
                        u = jnp.where(okg, ug, u)
                        v = jnp.where(okg, vg, v)
                        tile = jnp.where(okg, ti, tile)
                        tloc = jnp.where(okg, (t - near) * zf, tloc)
                    return t, u, v, tile, tloc

                def do_inner(args):
                    t, u, v, tile, tloc = args
                    word = nbuf[i, curr].astype(jnp.uint32)
                    xz = (word & 0xFF).astype(jnp.int32)
                    x_ = ((word >> 8) & 0xFF).astype(jnp.int32)
                    yz = ((word >> 16) & 0xFF).astype(jnp.int32)
                    y_ = ((word >> 24) & 0xFF).astype(jnp.int32)
                    ix1 = ((xz >> 5) & 7).astype(jnp.int32)
                    ix2 = ((xz >> 2) & 7).astype(jnp.int32)
                    ix3 = ((x_ >> 5) & 7).astype(jnp.int32)
                    ix4 = ((x_ >> 2) & 7).astype(jnp.int32)
                    iy1 = ((yz >> 5) & 7).astype(jnp.int32)
                    iy2 = ((yz >> 2) & 7).astype(jnp.int32)
                    iy3 = ((y_ >> 5) & 7).astype(jnp.int32)
                    iy4 = ((y_ >> 2) & 7).astype(jnp.int32)
                    iz1 = (xz & 3).astype(jnp.int32)
                    iz2 = (yz & 3).astype(jnp.int32)
                    x1 = params[PB + ix1]; x2 = params[PM + ix2]
                    x3 = params[PM + ix3]; x4 = params[PB + ix4]
                    y1 = params[PB + iy1]; y2 = params[PM + iy2]
                    y3 = params[PM + iy3]; y4 = params[PB + iy4]
                    z1 = params[PZ + iz1]; z2 = params[PZ + iz2]
                    dimx = bhx - blx; dimy = bhy - bly; dimz = bhz - blz

                    # child boxes (getNode, compressed_node.h:489-512)
                    l0x = blx + x1 * dimx; h0x = blx + (1 - x3) * dimx
                    l1x = blx + x2 * dimx; h1x = blx + (1 - x4) * dimx
                    l0y = bly + y1 * dimy; h0y = bly + (1 - y3) * dimy
                    l1y = bly + y2 * dimy; h1y = bly + (1 - y4) * dimy
                    lz = blz + z1 * dimz; hz = blz + (1 - z2) * dimz

                    cxs = (l0x, l1x, l0x, l1x)
                    cXs = (h0x, h1x, h0x, h1x)
                    cys = (l0y, l0y, l1y, l1y)
                    cYs = (h0y, h0y, h1y, h1y)

                    ks, cs, ps = [], [], []
                    boxes = []
                    for c in range(4):
                        tmin, tmax = slab(cxs[c], cys[c], lz,
                                          cXs[c], cYs[c], hz)
                        h = (tmin <= tmax) & (tmin <= tloc) & alive
                        dist = jnp.min(jnp.where(h, tmin, INF))
                        ks.append(jnp.where(dist < INF, dist, -INF))
                        ps.append(dist < INF)
                        cs.append(jnp.int32(0) + curr * 4 + 1 + c)
                        boxes.append((cxs[c], cys[c], lz, cXs[c], cYs[c], hz))
                    bx = [list(b) for b in boxes]
                    for (a, b) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                        sw = ks[a] < ks[b]
                        ks[a], ks[b] = (jnp.where(sw, ks[b], ks[a]),
                                        jnp.where(sw, ks[a], ks[b]))
                        cs[a], cs[b] = (jnp.where(sw, cs[b], cs[a]),
                                        jnp.where(sw, cs[a], cs[b]))
                        ps[a], ps[b] = (jnp.where(sw, ps[b], ps[a]),
                                        jnp.where(sw, ps[a], ps[b]))
                        for m in range(6):
                            bx[a][m], bx[b][m] = (
                                jnp.where(sw, bx[b][m], bx[a][m]),
                                jnp.where(sw, bx[a][m], bx[b][m]))
                    sp2 = qsp
                    for k in range(4):
                        sp_k = sp2

                        @pl.when(ps[k])
                        def _(sp_k=sp_k, k=k):
                            qstack[sp_k] = cs[k]
                            qboxes[sp_k, 0] = bx[k][0]
                            qboxes[sp_k, 1] = bx[k][1]
                            qboxes[sp_k, 2] = bx[k][2]
                            qboxes[sp_k, 3] = bx[k][3]
                            qboxes[sp_k, 4] = bx[k][4]
                            qboxes[sp_k, 5] = bx[k][5]

                        sp2 = sp2 + ps[k].astype(jnp.int32)
                    return t, u, v, tile, tloc, sp2

                def leaf_branch(a):
                    t, u, v, tile, tloc = do_leaf(a)
                    return t, u, v, tile, tloc, qsp

                def inner_branch(a):
                    return do_inner(a)

                t, u, v, tile, tloc, qsp = jax.lax.cond(
                    curr >= elems, leaf_branch, inner_branch,
                    (t, u, v, tile, tloc))
                return qsp, t, u, v, tile, tloc, qpops + 1

            def qstep(carry):
                # pop TWO quadtree nodes per while iteration — measured
                # best on bomberman (1 pop: 302 ms/frame, 2: 261, 4:
                # 417 — the guard lax.conds cost more than the loop
                # overhead they save beyond 2)
                carry = jax.lax.cond(carry[0] > 0, _qpop,
                                     lambda c: c, carry)
                return jax.lax.cond(carry[0] > 0, _qpop,
                                    lambda c: c, carry)

            def qcond(carry):
                return (carry[0] > 0) & (carry[6] < max_pops)

            _qsp, t, u, v, tile, _tl, _qp = jax.lax.while_loop(
                qcond, qstep,
                (jnp.int32(1), t, u, v, tile, tloc, jnp.int32(0)))
            return t, u, v, tile

        # ---- top-level walk: K-wide unified node/tile stack -------------
        eff_depth = STACK_DEPTH - (3 * 80 + K * 4)

        def process_node(i, t, u, v, tile, sp, drops):
            keys, refs, pushes = [], [], []
            for c in range(4):
                lx = nrow[i, 0 + c]; ly = nrow[i, 4 + c]; lz = nrow[i, 8 + c]
                hx = nrow[i, 12 + c]; hy = nrow[i, 16 + c]
                hz = nrow[i, 20 + c]
                tx0 = lx * rdx - orx; tx1 = hx * rdx - orx
                ty0 = ly * rdy - ory; ty1 = hy * rdy - ory
                tz0 = lz * rdz - orz; tz1 = hz * rdz - orz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                               jnp.minimum(ty0, ty1)),
                                   jnp.minimum(tz0, tz1)) * ROBUST_MIN
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                               jnp.maximum(ty0, ty1)),
                                   jnp.maximum(tz0, tz1)) * ROBUST_MAX
                tmin = jnp.maximum(tmin, tnear)
                hitm = (tmin <= tmax) & (tmin <= t)
                dist = jnp.min(jnp.where(hitm, tmin, INF))
                any_hit = dist < INF
                cc = nrow[i, 24 + c].astype(jnp.int32)
                cnt = nrow[i, 28 + c].astype(jnp.int32)
                ok = any_hit & (cnt >= 0)
                # leaf = one tile (the oriented builder forces
                # maxLeafSize=1, bvh_builder_subdiv.cpp:842-846)
                ref = jnp.where(cnt > 0, -(tidx[cc] + 1), cc)
                keys.append(jnp.where(ok, dist, -INF))
                refs.append(ref)
                pushes.append(ok)
            for (a, b) in ((0, 1), (2, 3), (0, 2), (1, 3), (1, 2)):
                sw = keys[a] < keys[b]
                keys[a], keys[b] = (jnp.where(sw, keys[b], keys[a]),
                                    jnp.where(sw, keys[a], keys[b]))
                refs[a], refs[b] = (jnp.where(sw, refs[b], refs[a]),
                                    jnp.where(sw, refs[a], refs[b]))
                pushes[a], pushes[b] = (
                    jnp.where(sw, pushes[b], pushes[a]),
                    jnp.where(sw, pushes[a], pushes[b]))
            for k in range(4):
                sp_k = sp
                can = pushes[k] & (sp_k < STACK_DEPTH)

                @pl.when(can)
                def _(sp_k=sp_k, k=k):
                    stack[sp_k] = refs[k]

                sp = sp + can.astype(jnp.int32)
                drops = drops + (pushes[k] & ~can).astype(jnp.int32)
            return t, u, v, tile, sp, drops

        def step(carry):
            sp, t, u, v, tile, pops, drops = carry
            npop = jnp.minimum(jnp.minimum(sp, K),
                               jnp.maximum(1, (eff_depth - sp) // 4))
            refs = []
            for i in range(K):
                idx = jnp.maximum(sp - 1 - i, 0)
                r = jnp.where(i < npop, stack[idx], SENT)
                refs.append(r)
                start_ref(i, r)
            sp = sp - npop
            for i in range(K):
                wait_ref(i, refs[i])
                is_node = refs[i] >= 0
                is_tile = (refs[i] < 0) & (refs[i] != SENT)
                t, u, v, tile, sp, drops = jax.lax.cond(
                    is_node,
                    lambda a, i=i: process_node(i, *a),
                    lambda a: a, (t, u, v, tile, sp, drops))
                t, u, v, tile = jax.lax.cond(
                    is_tile,
                    lambda a, i=i: tile_intersect(i, -refs[i] - 1, *a),
                    lambda a: a, (t, u, v, tile))
            return sp, t, u, v, tile, pops + 1, drops

        def cond(carry):
            return (carry[0] > 0) & (carry[5] < max_pops)

        tile0 = jnp.full(TILE, -1, jnp.int32)
        z = jnp.zeros(TILE, jnp.float32)
        sp, t, u, v, tile, pops, drops = jax.lax.while_loop(
            cond, step, (jnp.int32(1), tf_in[:], z, z, tile0, jnp.int32(0),
                         jnp.int32(0)))
        t_out[:] = t
        u_out[:] = u
        v_out[:] = v
        tile_out[:] = tile
        b = pl.program_id(0)
        stats_out[b, 0] = pops
        stats_out[b, 1] = drops

    return kernel


@functools.partial(jax.jit, static_argnames=("num_blocks", "mode", "cl",
                                             "interpret"))
def _run(pc: PallasCompressed, tiles_in, num_blocks: int, mode: str, cl: int,
         interpret=False):
    params = jnp.concatenate([
        jnp.asarray([262144.0], jnp.float32),
        jnp.asarray(TABLE_BORDER), jnp.asarray(TABLE_MID),
        jnp.asarray(TABLE_Z)])
    # large compressed scenes keep their tile tables in HBM — every
    # access is already a per-tile row DMA, so only fetch latency (hidden
    # by the tile-entry pipeline) changes, not the kernel structure
    hbm = pc.vmem_bytes > VMEM_TABLE_BUDGET
    table_spec = pl.BlockSpec(memory_space=pltpu.ANY if hbm else pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ray_spec = pl.BlockSpec(TILE, lambda i: (i, 0), memory_space=pltpu.VMEM)
    grid3_spec = pl.BlockSpec(memory_space=pltpu.ANY if hbm else pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(mode, cl),
        grid=(num_blocks,),
        in_specs=[smem_spec, smem_spec] + [table_spec] * 5 + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((num_blocks * CSUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * CSUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * CSUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * CSUB, 128), jnp.int32),
            jax.ShapeDtypeStruct((num_blocks, 2), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),       # top ref stack
            pltpu.SMEM((POP_K, 128), jnp.float32),       # K node rows
            pltpu.SMEM((POP_K, 128), jnp.float32),       # K tile headers
            pltpu.SMEM((POP_K, 128), jnp.int32),         # K tile nodes
            pltpu.SMEM((POP_K, 128), jnp.int32),         # K tile leaves
            pltpu.SMEM((POP_K, 8, 128), jnp.float32),    # K tile grids
            pltpu.SMEM((QDEPTH,), jnp.int32),            # quadtree stack
            pltpu.SMEM((QDEPTH, 6), jnp.float32),        # quadtree boxes
            pltpu.SemaphoreType.DMA((POP_K,)),
            pltpu.SemaphoreType.DMA((POP_K,)),
            pltpu.SemaphoreType.DMA((POP_K,)),
            pltpu.SemaphoreType.DMA((POP_K,)),
            pltpu.SemaphoreType.DMA((POP_K,)),
        ],
        interpret=interpret,
    )(params, pc.tile_of_leaf, pc.topnodes, pc.theader, pc.tnodes, pc.tleaf,
      pc.tgrid, *tiles_in)


def intersect_compressed_pallas(pc: PallasCompressed, rays, t_in=None,
                                interpret: bool = False) -> _CHit:
    """Drop-in for traverse.cbvh.intersect_compressed on TPU."""
    from ..core.rayhit import Rays
    if t_in is not None:
        rays = Rays(rays.org, rays.dir, rays.tnear,
                    t_in.reshape(rays.tnear.shape))
    tiles_in, R, nb = _ray_tiles(rays, CSUB)
    t_o, u_o, v_o, tile_o, _stats = _run(pc, tiles_in, nb, pc.mode,
                                         pc.comp_level, interpret)
    t = t_o.reshape(-1)[:R]
    u = u_o.reshape(-1)[:R]
    v = v_o.reshape(-1)[:R]
    tile = tile_o.reshape(-1)[:R]
    # uv remap to patch space happens here (kernel returns tile-local uv)
    ti = jnp.maximum(tile, 0)
    u = jnp.where(tile >= 0, pc.uv0[ti, 0] + u * pc.uvd[ti, 0], 0.0)
    v = jnp.where(tile >= 0, pc.uv0[ti, 1] + v * pc.uvd[ti, 1], 0.0)
    return _CHit(t=t, u=u, v=v, tile=tile)


def _occl_kernel(params, topnodes, ox, oy, oz, dx, dy, dz, tn_in, tf_in,
                 occ_out, stack, nrow, nsem):
    """Conservative compressed occlusion on TPU: a ray is occluded when it
    hits any tile's top-level leaf box (compressed.h:754-756 semantics)."""
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    rdx = _rcp_safe(dx[:]); rdy = _rcp_safe(dy[:]); rdz = _rcp_safe(dz[:])
    orx = o_x * rdx; ory = o_y * rdy; orz = o_z * rdz
    tnear = tn_in[:]
    tfar = tf_in[:]
    max_pops = params[0].astype(jnp.int32)
    stack[0] = jnp.int32(0)

    def step(carry):
        sp, occ, pops = carry
        sp = sp - 1
        node = stack[sp]
        ndma = pltpu.make_async_copy(topnodes.at[node], nrow, nsem)
        ndma.start()
        ndma.wait()
        tcur = jnp.where(occ > 0, -INF, tfar)
        for c in range(4):
            lx = nrow[0 + c]; ly = nrow[4 + c]; lz = nrow[8 + c]
            hx = nrow[12 + c]; hy = nrow[16 + c]; hz = nrow[20 + c]
            tx0 = lx * rdx - orx; tx1 = hx * rdx - orx
            ty0 = ly * rdy - ory; ty1 = hy * rdy - ory
            tz0 = lz * rdz - orz; tz1 = hz * rdz - orz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1)) * ROBUST_MIN
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1)) * ROBUST_MAX
            tmin = jnp.maximum(tmin, tnear)
            hitm = (tmin <= tmax) & (tmin <= tcur)
            cnt = nrow[28 + c].astype(jnp.int32)
            cc = nrow[24 + c].astype(jnp.int32)
            occ = jnp.where(hitm & (cnt > 0), jnp.int32(1), occ)
            push = (cnt == 0) & (jnp.max(hitm.astype(jnp.int32)) > 0)

            sp_k = sp

            @pl.when(push)
            def _(sp_k=sp_k, cc=cc):
                stack[sp_k] = cc

            sp = sp + push.astype(jnp.int32)
        return sp, occ, pops + 1

    def cond(carry):
        live = jnp.min(carry[1]) == 0
        return (carry[0] > 0) & live & (carry[2] < max_pops)

    occ0 = jnp.zeros(TILE, jnp.int32)
    _sp, occ, _p = jax.lax.while_loop(cond, step,
                                      (jnp.int32(1), occ0, jnp.int32(0)))
    occ_out[:] = occ


@functools.partial(jax.jit, static_argnames=("num_blocks", "interpret"))
def _run_occl(pc: PallasCompressed, tiles_in, num_blocks: int,
              interpret=False):
    params = jnp.asarray([262144.0], jnp.float32)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pc.topnodes.shape[0] * 512 > VMEM_TABLE_BUDGET
    table_spec = pl.BlockSpec(memory_space=pltpu.ANY if hbm else pltpu.VMEM)
    ray_spec = pl.BlockSpec(TILE, lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _occl_kernel,
        grid=(num_blocks,),
        in_specs=[smem_spec, table_spec] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * CSUB, 128), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((128,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(params, pc.topnodes, *tiles_in)


def occluded_compressed_pallas(pc: PallasCompressed, rays,
                               interpret: bool = False):
    tiles_in, R, nb = _ray_tiles(rays, CSUB)
    occ = _run_occl(pc, tiles_in, nb, interpret)
    return (occ.reshape(-1)[:R] != 0).reshape(rays.batch_shape)
