"""Microbench: gather vs scatter vs matmul-gather; sort variants."""
import time
import numpy as np
import jax
import jax.numpy as jnp

n = 1 << 20
T = 3200
REPS = 6
rng = np.random.default_rng(2)

perms = [jnp.asarray(rng.permutation(n).astype(np.int32)) for _ in range(REPS)]
xs = [jnp.asarray(rng.normal(size=(n,)).astype(np.float32)) for _ in range(REPS)]
ps = [jnp.asarray(rng.integers(0, T, n, dtype=np.int32)) for _ in range(REPS)]
keys = [jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.uint32))
        for _ in range(REPS)]
table = jnp.asarray(rng.normal(size=(T, 12)).astype(np.float32))


def timeit(name, f, argsets):
    jax.block_until_ready(f(*argsets[0]))
    t0 = time.perf_counter()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(argsets)
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return outs[0]


# A. permutation reorder: gather vs scatter
timeit("perm gather x[perm]", jax.jit(lambda x, p: x[p]),
       list(zip(xs, perms)))
timeit("perm scatter zeros.at[perm].set(x)",
       jax.jit(lambda x, p: jnp.zeros_like(x).at[p].set(x)),
       list(zip(xs, perms)))

# B. small-table gather: plain vs one-hot matmul f32 vs bf16 hi/lo
timeit("table gather table[p]", jax.jit(lambda p: table[p]), [(p,) for p in ps])


@jax.jit
def mm_gather_f32(p):
    C = 1 << 13
    p2 = p.reshape(-1, C)

    def body(_, pc):
        oh = (pc[:, None] == jnp.arange(T)[None, :]).astype(jnp.float32)
        return None, oh @ table

    _, out = jax.lax.scan(body, None, p2)
    return out.reshape(n, 12)


g1 = timeit("table one-hot matmul f32 (scan 8k)", mm_gather_f32,
            [(p,) for p in ps])

th = table.astype(jnp.bfloat16)
tl = (table - th.astype(jnp.float32)).astype(jnp.bfloat16)


@jax.jit
def mm_gather_hilo(p):
    C = 1 << 13
    p2 = p.reshape(-1, C)

    def body(_, pc):
        oh = (pc[:, None] == jnp.arange(T)[None, :]).astype(jnp.bfloat16)
        hi = jnp.dot(oh, th, preferred_element_type=jnp.float32)
        lo = jnp.dot(oh, tl, preferred_element_type=jnp.float32)
        return None, hi + lo

    _, out = jax.lax.scan(body, None, p2)
    return out.reshape(n, 12)


g2 = timeit("table one-hot matmul bf16 hi/lo", mm_gather_hilo,
            [(p,) for p in ps])
ref = table[ps[0]]
print("  f32 mm exact:", bool(jnp.all(g1 == ref)),
      " hi/lo max err:", float(jnp.max(jnp.abs(g2 - ref))))

# C. sorts
timeit("argsort u32 (1M)", jax.jit(lambda k: jnp.argsort(k)),
       [(k,) for k in keys])
timeit("lax.sort single u32", jax.jit(lambda k: jax.lax.sort((k,))),
       [(k,) for k in keys])


@jax.jit
def packed_sort(k):
    # 12-bit key in top bits, 20-bit index below
    packed = ((k >> 18) << 20) | jnp.arange(n, dtype=jnp.uint32)
    s = jax.lax.sort((packed,))[0]
    return (s & jnp.uint32(0xFFFFF)).astype(jnp.int32)


timeit("packed 12b key sort -> perm", packed_sort, [(k,) for k in keys])


@jax.jit
def full_resort(k, x):
    # end-to-end: perm via packed sort, inv via scatter, reorder via scatter
    perm = packed_sort(k)
    iota = jnp.arange(n, dtype=jnp.int32)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
    xs_ = jnp.zeros_like(x).at[inv].set(x)
    return xs_, perm, inv


timeit("packed sort + inv scatter + 1 reorder", full_resort,
       list(zip(keys, xs)))
