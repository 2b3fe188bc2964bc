"""Phase-level profile of the rowtrace round loop at 1M prims/rays:
per-call cost of kernel round / mid scan / sort at each bucket size,
plus the executed round count. Drives optimization (bytes-per-ray
roofline lives in BASELINE.md)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def timed(f, *a, reps=6):
    import jax
    out = f(*a); jax.block_until_ready(out)      # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3, out

def main():
    import jax, jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.core.rayhit import Rays
    from embree_tpu.traverse import rowtrace as rt
    from embree_tpu.verify.fixtures import triangle_sphere

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 707
    rng = np.random.default_rng(0xBE7C4)
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, res)
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()
    ts = cs.rowtrace
    print(f"tris={len(idx)} treelets={ts.num_treelets} mids={ts.num_mids} "
          f"fan={ts.fan}", flush=True)

    n = 1 << 20
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)

    org = jnp.asarray(org); d = jnp.asarray(d)
    tn = jnp.zeros((n,), jnp.float32); tf = jnp.full((n,), np.inf, jnp.float32)

    # build initial state exactly as _rowtrace_impl does
    R = n; Rp = rt._bucket(-(-R // 1024)) * 1024
    state = (
        org[:, 0], org[:, 1], org[:, 2], d[:, 0], d[:, 1], d[:, 2],
        tn, tf,
        jnp.full((R,), -1, jnp.int32),
        jnp.arange(R, dtype=jnp.int32),
        jnp.full((R,), -1, jnp.int32),
        jnp.full((R,), rt.NINF), jnp.full((R,), rt.NINF),
        jnp.full((R,), -1, jnp.int32),
        jnp.full((R,), rt.INF),
        jnp.full((R,), -1, jnp.int32),
        jnp.full((R,), rt._NEED_MID, jnp.int32),
    )
    ms, state = timed(lambda s: rt._mid_scan(s, ts.mid_boxes, ts.num_mids), state)
    print(f"mid_scan full: {ms:.2f} ms", flush=True)
    ms, out = timed(lambda s: rt._sort_state(s, ts.fan), state)
    state, n_active = out
    print(f"sort full: {ms:.2f} ms  n_active={int(n_active)}", flush=True)

    for ntiles in (1024, 256, 64, 16):
        ms, _ = timed(lambda s: rt._kernel_round(
            s, ts.blocks, ts.tre_boxes, ts.fan, ntiles, False, False, False),
            state)
        print(f"kernel_round ntiles={ntiles}: {ms:.2f} ms", flush=True)

    for sz in (1 << 20, 1 << 18, 1 << 16, 1 << 14):
        sl = tuple(a[:sz] for a in state)
        ms, _ = timed(lambda s: rt._sort_state(s, ts.fan), sl)
        print(f"sort {sz}: {ms:.2f} ms", flush=True)
        ms, _ = timed(lambda s: rt._mid_scan(s, ts.mid_boxes, ts.num_mids), sl)
        print(f"mid_scan {sz}: {ms:.2f} ms", flush=True)

    # full traversal + rounds executed: replicate the while loop on host
    # over the jitted pieces to count rounds & active curve
    st = state; rounds = 0; na = int(n_active); curve = []
    t0 = time.perf_counter()
    while na > 0 and rounds < 100000:
        sizes = rt._prefix_sizes(Rp)
        size = next(s for s in sizes if s >= na)
        st = rt._kernel_round(st, ts.blocks, ts.tre_boxes, ts.fan,
                              size // 1024, False, False, False)
        sl = tuple(a[:size] for a in st)
        sl = rt._mid_scan(sl, ts.mid_boxes, ts.num_mids)
        sl, n_act = rt._sort_state(sl, ts.fan)
        st = tuple(f.at[:size].set(s) for f, s in zip(st, sl))
        na = int(n_act); rounds += 1
        curve.append(na)
    print(f"rounds={rounds} host-loop total {time.perf_counter()-t0:.1f}s",
          flush=True)
    print("active curve:", curve[:20], "...", curve[-5:], flush=True)

main()
