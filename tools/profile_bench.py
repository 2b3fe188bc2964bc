"""Break down bench.py time: forward-only, reeval+grad-only, combined."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.diff.hit import reeval_hit
from embree_tpu.scene.scene import scene_intersect
from embree_tpu.verify.fixtures import triangle_sphere

rng = np.random.default_rng(0xBE7C4)
verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, 40)
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
idxj = np.asarray(idx)


def timeit(name, f, *a, reps=8):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    outs = [f(*a) for _ in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.2f} ms   {n/dt/1e6:7.2f} Mray/s")
    return out


# 1. forward only
fwd = jax.jit(lambda c, r: scene_intersect(c, r, isa=isa))
sel = timeit("forward scene_intersect", fwd, cs, rays)

# 2. reeval_hit fwd+grad only (given fixed sel)
def reeval_loss(vertices, c, r, sel):
    tris = c.tris._replace(v0=vertices[idxj[:, 0]],
                           v1=vertices[idxj[:, 1]],
                           v2=vertices[idxj[:, 2]])
    h = reeval_hit(tris, r, sel.gprim, sel.valid)
    return jnp.sum(jnp.where(h.valid, h.t, 0.0))

g2 = jax.jit(jax.value_and_grad(reeval_loss))
vparam = jnp.asarray(verts)
timeit("reeval+grad (fixed sel)", g2, vparam, cs, rays, sel)

# 3. full bench loss
def loss_fn(vertices, c, r):
    tris = c.tris._replace(v0=vertices[idxj[:, 0]],
                           v1=vertices[idxj[:, 1]],
                           v2=vertices[idxj[:, 2]])
    c2 = c._replace(tris=tris)
    sel = jax.lax.stop_gradient(scene_intersect(c, r, isa=isa))
    h = reeval_hit(c2.tris, r, sel.gprim, sel.valid)
    return jnp.sum(jnp.where(h.valid, h.t, 0.0))

g3 = jax.jit(jax.value_and_grad(loss_fn))
timeit("full fwd+bwd (bench.py)", g3, vparam, cs, rays)

# 4. forward with no stream sort (direct kernel) for comparison
fwd_nosort = jax.jit(lambda c, r: scene_intersect(c, r, isa=isa, coherent=True))
try:
    timeit("forward coherent-flag (no sort)", fwd_nosort, cs, rays)
except TypeError:
    print("(no coherent kwarg)")
