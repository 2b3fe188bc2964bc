"""Driver benchmark: prints ONE JSON line.

Metric: incoherent-ray closest-hit traversal throughput (Mray/s) on one
chip via the pallas packet megakernel — the BASELINE.md "Mrays/s/chip,
incoherent paths" axis (forward; fwd+bwd lands with the diff renderer
bench). Baseline constant: 10 Mray/s, an embree-class single-core CPU
incoherent-traversal figure (the reference publishes no stored numbers —
BASELINE.md), so vs_baseline = value / 10.
"""
import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    import embree_tpu as et
    from embree_tpu.verify.fixtures import triangle_sphere

    rng = np.random.default_rng(0xBE7C4)
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, 40)  # 3200 tris
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()

    n = 65536
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    rays = et.make_rays(org, d)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    isa = "default" if (on_tpu and cs.pallas is not None) else "xla"
    # one fused program (sort + pallas kernel + finalize): the first-ever
    # compile on the axon stack is slow but server-cached; steady state
    # is a single dispatch per frame.
    f = jax.jit(lambda c, r: et.scene_intersect(c, r, isa=isa).t)
    run = lambda: f(cs, rays)

    jax.block_until_ready(run())  # warmup/compile
    reps = 16
    t0 = time.perf_counter()
    outs = [run() for _ in range(reps)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    mrayps = reps * n / dt / 1e6

    baseline = 10.0
    print(json.dumps({
        "metric": "incoherent_intersect_mrayps",
        "value": round(mrayps, 3),
        "unit": "Mray/s",
        "vs_baseline": round(mrayps / baseline, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
