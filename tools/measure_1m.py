"""Quick 1M-prim measurement: fwd-only and fwd+bwd Mray/s on the chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.diff.hit import reeval_hit
    from embree_tpu.scene.scene import scene_intersect
    from embree_tpu.verify.fixtures import triangle_sphere

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 707
    rng = np.random.default_rng(0xBE7C4)
    t0 = time.perf_counter()
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, res)
    print(f"tris={len(idx)} gen={time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()
    print(f"commit={time.perf_counter()-t0:.1f}s pallas={cs.pallas is not None}", flush=True)
    if cs.pallas is not None:
        print("vmem_bytes", cs.pallas.vmem_bytes, "nodes", cs.pallas.nodes.shape, flush=True)

    n = 1 << 20
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    rays = et.make_rays(org, d)
    idxj = np.asarray(idx)

    # fwd only
    def fwd(c, r):
        sel = scene_intersect(c, r, isa="default")
        return jnp.sum(jnp.where(sel.valid, sel.t, 0.0))
    ffwd = jax.jit(fwd)
    t0 = time.perf_counter(); v = float(ffwd(cs, rays)); print(f"fwd compile+run {time.perf_counter()-t0:.1f}s val={v:.3e}", flush=True)
    reps = 8
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(reps):
        acc += float(ffwd(cs, rays))
    dt = time.perf_counter() - t0
    print(f"fwd: {reps*n/dt/1e6:.2f} Mray/s", flush=True)

    def loss_fn(vertices, c, r):
        tris = c.tris._replace(v0=vertices[idxj[:, 0]], v1=vertices[idxj[:, 1]], v2=vertices[idxj[:, 2]])
        c2 = c._replace(tris=tris)
        sel = jax.lax.stop_gradient(scene_intersect(c, r, isa="default"))
        h = reeval_hit(c2.tris, r, sel.gprim, sel.valid)
        return jnp.sum(jnp.where(h.valid, h.t, 0.0))
    f = jax.jit(jax.value_and_grad(loss_fn))
    vparam = jnp.asarray(verts)
    t0 = time.perf_counter()
    out = f(vparam, cs, rays); v = float(out[0])
    print(f"fwdbwd compile+run {time.perf_counter()-t0:.1f}s val={v:.3e}", flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(vparam, cs, rays)
        s = float(out[0])
    dt = time.perf_counter() - t0
    print(f"fwdbwd: {reps*n/dt/1e6:.2f} Mray/s", flush=True)

main()
