"""Phase-level profile of rowtrace2 at benchmark scale: mid prepass,
full-size state sort, forward, and the in-kernel SCHEDULE COUNTERS
(turns / walks / participants / loop iterations) that drive the
BASELINE.md round-5 roofline re-split."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


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
    flat = Rays(jnp.asarray(org), jnp.asarray(d),
                jnp.zeros((nrays,), jnp.float32),
                jnp.full((nrays,), np.inf, jnp.float32))
    su = jax.jit(lambda a: jnp.sum(a))

    t0 = time.perf_counter()
    t, prim, (rounds, st) = rt.rowtrace2_schedule_stats(ts, flat)
    hits = int(np.asarray((prim >= 0).sum()))
    print(f"first call (compiles): {time.perf_counter()-t0:.1f}s "
          f"hits={hits}", flush=True)
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        t, prim, _ = rt.rowtrace2_schedule_stats(ts, flat)
        _ = float(su(t))
    dt = (time.perf_counter() - t0) / reps
    print(f"fwd: {dt*1e3:.1f} ms => {nrays/dt/1e6:.2f} Mray/s", flush=True)

    st = np.asarray(st)
    turns, walks, part, nit, lit = [int(x) for x in st]
    print(f"rounds={int(rounds)} row-turns={turns} row-walks={walks} "
          f"sum_part={part}")
    print(f"avg participants/walk = {part/max(walks,1):.1f} of 1024 lanes")
    print(f"walk-loop iterations: node={nit} leaf={lit} "
          f"(x ~0.7us Mosaic overhead each)")
    print(f"serve units = {part} ({part/max(hits,1):.2f} per hit ray)")


main()
