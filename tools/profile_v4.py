"""v4 kernel experiment: direct VMEM dynamic-row loads for node/leaf data
(no DMA+SMEM round trip), bounds consumed as (1,1)-slice broadcasts.
Compares against production v3 on the sorted 1M incoherent workload."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import embree_tpu as et
from embree_tpu.traverse.pallas_packet import (
    _ray_tiles, _run_intersect, NT_PER_ROW, MAX_LEAF, STACK_DEPTH,
    ROBUST_MIN, ROBUST_MAX, INF, _rcp_safe, _SORT_NETS)
from embree_tpu.traverse.stream import sort_rays_stream
from embree_tpu.verify.fixtures import triangle_sphere

SUB = 64


def _kernel_v4(occluded: bool, sub: int, width: int):
    W = width

    def kernel(params, nodes, tdata,
               ox, oy, oz, dx, dy, dz, tn, tf,
               t_out, prim_out, stats_out, stack):
        max_iters = params[0]
        rdx = _rcp_safe(dx[:]); rdy = _rcp_safe(dy[:]); rdz = _rcp_safe(dz[:])
        orx = ox[:] * rdx; ory = oy[:] * rdy; orz = oz[:] * rdz
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        tnear = tn[:]

        def mt_leaf(ref, t, prim):
            v = -ref - 1
            start = v >> 4
            cnt = v & 15
            row = start // NT_PER_ROW
            rows = tdata[pl.ds(row, 2)]          # (2, 128) direct VMEM load

            def body(k, carry):
                t, prim = carry
                p = start + k
                rr = p // NT_PER_ROW - row
                tc = (p % NT_PER_ROW) * 12

                def s(j):
                    return jax.lax.dynamic_slice(rows, (rr, tc + j), (1, 1))

                v0x = s(0); v0y = s(1); v0z = s(2)
                e1x = s(3); e1y = s(4); e1z = s(5)
                e2x = s(6); e2y = s(7); e2z = s(8)
                ngx = s(9); ngy = s(10); ngz = s(11)
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
                ok = (den != 0.0) & (u_s >= 0.0) & (v_s >= 0.0) \
                    & (u_s + v_s <= absden) \
                    & (absden * tnear < t_s) & (t_s <= absden * t)
                if occluded:
                    return jnp.where(ok, -INF, t), prim
                t_hit = t_s / jnp.maximum(absden, 1e-37)
                return jnp.where(ok, t_hit, t), jnp.where(ok, p, prim)

            return jax.lax.fori_loop(0, jnp.minimum(cnt, MAX_LEAF), body,
                                     (t, prim))

        def process_node(ref, t, prim, sp):
            row = nodes[pl.ds(ref, 1)]           # (1, 128) direct VMEM load

            def f(c, base):
                return jax.lax.dynamic_slice(row, (0, base * W + c), (1, 1))

            keys, refs, pushes = [], [], []
            for c in range(W):
                lox = f(c, 0); loy = f(c, 1); loz = f(c, 2)
                hix = f(c, 3); hiy = f(c, 4); hiz = f(c, 5)
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
                cc = f(c, 6)[0, 0].astype(jnp.int32)
                cnt = f(c, 7)[0, 0].astype(jnp.int32)
                ok = (dist < INF) & (cnt >= 0)
                r = jnp.where(cnt > 0, -(((cc << 4) | cnt) + 1), cc)
                keys.append(jnp.where(ok, dist, -INF))
                refs.append(r)
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
            for k in range(W):
                sp_k = sp

                @pl.when(pushes[k])
                def _(sp_k=sp_k, k=k):
                    stack[sp_k] = refs[k]

                sp = sp + pushes[k].astype(jnp.int32)
            return t, prim, sp

        def step(carry):
            sp, t, prim, iters, ltests = carry
            sp = sp - 1
            ref = stack[sp]
            is_node = ref >= 0
            t, prim, sp = jax.lax.cond(
                is_node, lambda a: process_node(ref, *a),
                lambda a: a, (t, prim, sp))
            t, prim = jax.lax.cond(
                ~is_node, lambda tp: mt_leaf(ref, *tp),
                lambda tp: tp, (t, prim))
            ltests = ltests + jnp.where(~is_node, (-ref - 1) & 15, 0)
            return sp, t, prim, iters + 1, ltests

        def cond(carry):
            return (carry[0] > 0) & (carry[3] < max_iters)

        stack[0] = 0
        prim0 = jnp.full((sub, 128), -1, jnp.int32)
        sp, t, prim, iters, ltests = jax.lax.while_loop(
            cond, step,
            (jnp.int32(1), tf[:], prim0, jnp.int32(0), jnp.int32(0)))
        t_out[:] = t
        prim_out[:] = prim
        bid = pl.program_id(0)
        stats_out[bid, 0] = iters
        stats_out[bid, 1] = ltests

    return kernel


def call_v4(num_blocks, sub, width):
    tile = (sub, 128)
    ray_spec = pl.BlockSpec(tile, lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_v4(False, sub, width),
        grid=(num_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  table_spec, table_spec] + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((num_blocks * sub, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_blocks * sub, 128), jnp.int32),
            jax.ShapeDtypeStruct((num_blocks, 2), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )


def main():
    rng = np.random.default_rng(0xBE7C4)
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, 40)
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()

    n = 1 << 20
    REPS = 6
    sorted_sets = []
    for i in range(REPS):
        r = np.random.default_rng(i)
        d = r.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        org = r.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
        sr, _ = sort_rays_stream(et.make_rays(org, d), cs.world_lower,
                                 cs.world_upper)
        sorted_sets.append(sr)
    jax.block_until_ready(sorted_sets)

    def timeit(name, f, argsets):
        out0 = jax.block_until_ready(f(*argsets[0]))
        t0 = time.perf_counter()
        outs = [f(*a) for a in argsets]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / len(argsets)
        print(f"{name:24s} {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s")
        return out0

    params = jnp.asarray([262144], jnp.int32)
    tilesets = [( _ray_tiles(r, SUB)[0], _ray_tiles(r, SUB)[2])
                for r in sorted_sets]

    f3 = jax.jit(lambda tiles, nb: _run_intersect(cs.pallas, tiles, nb,
                                                  False, SUB),
                 static_argnums=(1,))
    o3 = timeit("v3 (DMA+SMEM)", f3, tilesets)

    W = cs.pallas.width
    f4 = jax.jit(lambda tiles, nb: call_v4(nb, SUB, W)(
        params, cs.pallas.nodes, cs.pallas.tdata, *tiles),
        static_argnums=(1,))
    o4 = timeit("v4 (VMEM loads)", f4, tilesets)

    t3, p3 = np.asarray(o3[0]), np.asarray(o3[1])
    t4, p4 = np.asarray(o4[0]), np.asarray(o4[1])
    ok = np.isfinite(t3)
    print("match:", np.array_equal(p3, p4),
          "t allclose:", np.allclose(t3[ok], t4[ok & np.isfinite(t4)]
                                     if False else t4[ok], rtol=1e-6))


if __name__ == "__main__":
    main()
