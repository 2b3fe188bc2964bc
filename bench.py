"""Driver benchmark: prints ONE JSON line.

Metric: incoherent-ray forward+backward throughput (Mray/s) on one chip
at REFERENCE BENCHMARK SCALE — a ~1M-triangle scene (the reference's
incoherent benchmarks use 1M-prim scenes, verify.cpp:4473-4560) with 1M
random rays, fwd+bwd: forward through the rowtrace2 treelet kernel (the
per-lane incoherent fast path; HBM-resident treelet blocks), backward =
jax.grad of the loss through the differentiable hit re-evaluation
(pixel -> vertex gradients; hit selection under the traversal's
zero-grad custom_vjp). The whole fwd+bwd step is ONE jitted program —
no host round trips.

Baseline: 3.284 Mray/s — MEASURED on this host from the reference's own
binaries (.refbuild/build-avx2/verify, AVX2, all cores, the exact
IncoherentRaysBenchmark shape: verify.cpp:4473-4560; see BASELINE.md
"MEASURED reference performance"). vs_baseline = value / 3.284; note the
reference figure is fwd-only while ours is fwd+bwd.

NOTE (axon): the fused jit program's FIRST-ever compile takes minutes on
the remote compiler but is server-cached; steady state is one dispatch.
`jax.block_until_ready` can silently not block on axon — timing forces a
host transfer of the loss value every rep.
"""
import json
import os
import sys
import time

import numpy as np

SCENE_RES = 707       # triangle_sphere(707) = 998,284 triangles
# 2M incoherent rays per dispatch: same scene/ray distribution as the
# reference's 1M-ray benchmark shape, doubled for device occupancy
# (throughput is the metric; the TPU amortizes fixed dispatch/regroup
# costs over the batch). BENCH_LOG2_RAYS=20 reproduces the 1M-ray
# number the ledger reports alongside (ADVICE r4).
N_RAYS = 1 << int(os.environ.get("BENCH_LOG2_RAYS", "21"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    import embree_tpu as et
    from embree_tpu.diff.hit import hit_t_grad
    from embree_tpu.scene.scene import scene_intersect
    from embree_tpu.verify.fixtures import triangle_sphere

    rng = np.random.default_rng(0xBE7C4)
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, SCENE_RES)
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()

    n = N_RAYS
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    rays = et.make_rays(org, d)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    isa = "default" if (on_tpu and cs.rowtrace is not None) else "xla"

    idxj = np.asarray(idx)  # numpy: captured by the jitted loss_fn

    idxd = jnp.asarray(idxj)

    def loss_fn(vertices, c, r):
        # BVH structure + hit selection stay stop-gradient; the loss
        # surface is the FUSED t-gradient (diff/hit.py hit_t_grad, r5):
        # the primal is the traversal kernel's own t (zero forward
        # re-evaluation gathers) and the VJP gathers the winning
        # corners and applies the analytic dt/dcorner formulas into one
        # payload-sort segment-sum — gradient equal to the full
        # re-evaluation's (tools/profile_bwd.py / tests/test_diff.py
        # check equivalence)
        sel = jax.lax.stop_gradient(scene_intersect(c, r, isa=isa))
        t = hit_t_grad(vertices, idxd, r, sel.gprim, sel.valid,
                       sel.t, tris=c.tris)
        return jnp.sum(jnp.where(sel.valid, t, 0.0))

    f = jax.jit(jax.value_and_grad(loss_fn))
    vparam = jnp.asarray(verts)

    v0 = float(f(vparam, cs, rays)[0])     # warmup/compile + forced sync
    assert np.isfinite(v0)
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(vparam, cs, rays)
        _ = float(out[0])                  # host sync each rep
    dt = time.perf_counter() - t0
    mrayps = reps * n / dt / 1e6

    baseline = 3.284   # measured: reference AVX2 all-core on this host
    print(json.dumps({
        "metric": "incoherent_fwdbwd_mrayps_1Mprims",
        "value": round(mrayps, 3),
        "unit": "Mray/s",
        "vs_baseline": round(mrayps / baseline, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
