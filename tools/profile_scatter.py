"""Microbench scatter-add alternatives for the backward pass."""
import time
import numpy as np
import jax
import jax.numpy as jnp

n = 1 << 20
T = 3200
REPS = 6
rng = np.random.default_rng(1)
idxsets = [jnp.asarray(rng.integers(0, T, n, dtype=np.int32))
           for _ in range(REPS)]
gsets = [jnp.asarray(rng.normal(size=(n, 9)).astype(np.float32))
         for _ in range(REPS)]


def timeit(name, f):
    jax.block_until_ready(f(idxsets[0], gsets[0]))
    t0 = time.perf_counter()
    outs = [f(i, g) for i, g in zip(idxsets, gsets)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:40s} {dt*1e3:8.2f} ms")


@jax.jit
def scatter_add(idx, g):
    return jnp.zeros((T, 9), jnp.float32).at[idx].add(g)


@jax.jit
def sorted_segsum(idx, g):
    order = jnp.argsort(idx)
    return jax.ops.segment_sum(g[order], idx[order], T,
                               indices_are_sorted=True)


@jax.jit
def segsum_unsorted(idx, g):
    return jax.ops.segment_sum(g, idx, T)


@jax.jit
def onehot_matmul_chunked(idx, g):
    # (chunk, T) one-hot bf16 @ (chunk, 9) via dot_general per chunk, scanned
    C = 1 << 15  # 32768
    idx2 = idx.reshape(-1, C)
    g2 = g.reshape(-1, C, 9)

    def body(acc, xs):
        ic, gc = xs
        oh = jax.nn.one_hot(ic, T, dtype=jnp.bfloat16)  # (C, T)
        return acc + jnp.einsum("ct,cg->tg", oh, gc.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32), None

    acc, _ = jax.lax.scan(body, jnp.zeros((T, 9), jnp.float32), (idx2, g2))
    return acc


timeit("at[].add  (current)", scatter_add)
timeit("segment_sum unsorted", segsum_unsorted)
timeit("argsort + segment_sum sorted", sorted_segsum)
timeit("one-hot bf16 matmul scan", onehot_matmul_chunked)

# correctness spot check
a = scatter_add(idxsets[0], gsets[0])
d = onehot_matmul_chunked(idxsets[0], gsets[0])
print("matmul max err:", float(jnp.max(jnp.abs(a - d))),
      "rel:", float(jnp.max(jnp.abs(a - d)) / jnp.max(jnp.abs(a))))
