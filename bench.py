"""Driver benchmark: prints ONE JSON line.

Metric: incoherent-ray forward+backward throughput (Mray/s) on one chip —
the BASELINE.md "Mrays/s/chip, forward+backward, incoherent paths" axis.
Forward = pallas packet megakernel over stream-sorted rays; backward =
jax.grad through the differentiable hit re-evaluation (pixel -> vertex
gradients), with hit selection under stop_gradient (diff/hit.py).

Baseline constant: 10 Mray/s, an embree-class single-core CPU incoherent
figure (the reference publishes no stored numbers — BASELINE.md), so
vs_baseline = value / 10.

NOTE (axon): the fused jit program's FIRST-ever compile takes minutes on
the remote compiler but is server-cached; steady state is one dispatch.
"""
import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    import embree_tpu as et
    from embree_tpu.diff.hit import reeval_hit
    from embree_tpu.scene.scene import scene_intersect
    from embree_tpu.verify.fixtures import triangle_sphere

    rng = np.random.default_rng(0xBE7C4)
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, 40)  # 3200 tris
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()

    n = 1 << 20
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    rays = et.make_rays(org, d)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    isa = "default" if (on_tpu and cs.pallas is not None) else "xla"

    idxj = np.asarray(idx)  # numpy: captured by the jitted loss_fn

    def loss_fn(vertices, c, r):
        # rebuild differentiable leaf data from the parameter vertices;
        # BVH structure + hit selection stay stop-gradient
        tris = c.tris._replace(v0=vertices[idxj[:, 0]],
                               v1=vertices[idxj[:, 1]],
                               v2=vertices[idxj[:, 2]])
        c2 = c._replace(tris=tris)
        sel = jax.lax.stop_gradient(scene_intersect(c, r, isa=isa))
        h = reeval_hit(c2.tris, r, sel.gprim, sel.valid)
        return jnp.sum(jnp.where(h.valid, h.t, 0.0))

    f = jax.jit(jax.value_and_grad(loss_fn))
    vparam = jnp.asarray(verts)

    out = jax.block_until_ready(f(vparam, cs, rays))  # warmup/compile
    assert np.isfinite(float(out[0]))
    reps = 8
    t0 = time.perf_counter()
    outs = [f(vparam, cs, rays) for _ in range(reps)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    mrayps = reps * n / dt / 1e6

    baseline = 10.0
    print(json.dumps({
        "metric": "incoherent_fwdbwd_mrayps",
        "value": round(mrayps, 3),
        "unit": "Mray/s",
        "vs_baseline": round(mrayps / baseline, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
