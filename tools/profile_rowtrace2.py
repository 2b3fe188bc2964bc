"""Phase-level profile of rowtrace2 v5 at benchmark scale: mid prepass,
full-size state sort, full forward, fwd+bwd split, and a max_rounds
sweep to count outer regroup rounds."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def sync(x):
    import jax, jax.numpy as jnp
    return float(jax.jit(lambda a: jnp.sum(jnp.asarray(a, jnp.float32)))(x))


def timeit(f, *a, reps=6):
    out = f(*a)
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
        sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / reps, out


def main():
    import jax, jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.core.rayhit import Rays
    from embree_tpu.traverse import rowtrace2 as rt
    from embree_tpu.verify.fixtures import triangle_sphere

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 707
    nrays = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 21)
    rng = np.random.default_rng(0xBE7C4)
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, res)
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()
    ts = cs.rowtrace
    print(f"tris={len(idx)} treelets={ts.num_treelets} mids={ts.num_mids} "
          f"fan={ts.fan} rays={nrays}", flush=True)

    d = rng.normal(size=(nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (nrays, 3)).astype(np.float32)
    orgj = jnp.asarray(org); dj = jnp.asarray(d)
    tn = jnp.zeros((nrays,), jnp.float32)
    tf = jnp.full((nrays,), np.inf, jnp.float32)
    flat = Rays(orgj, dj, tn, tf)

    mid_words = max(1, -(-ts.num_mids // 32))
    ms, _ = timeit(lambda: rt._mid_mask_prepass(
        orgj, dj, tn, tf, ts.mid_boxes, ts.num_mids, mid_words))
    print(f"mid prepass: {ms*1e3:.1f} ms", flush=True)

    # full-size variadic sort cost (13 f32/i32 + mid/fan words payload)
    n_pay = 13 + mid_words + 1
    arrs = tuple(jnp.asarray(rng.integers(0, 1 << 20, nrays), jnp.int32)
                 for _ in range(n_pay))
    srt = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1))
    ms, _ = timeit(lambda: srt(*arrs))
    print(f"full sort ({n_pay} arrays): {ms*1e3:.1f} ms", flush=True)

    for cap in (1, 2, 4, 8, 16, 0):
        ms, (t, prim) = timeit(
            lambda cap=cap: rt.intersect_rowtrace2(ts, flat,
                                                   max_rounds=cap), reps=3)
        hits = int(np.asarray((prim >= 0).sum()))
        print(f"fwd max_rounds={cap or 'inf'}: {ms*1e3:.1f} ms "
              f"({nrays/ms/1e6:.2f} Mray/s) hits={hits}", flush=True)


main()
