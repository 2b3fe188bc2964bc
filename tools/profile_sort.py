"""Decompose sort_rays_perm: keys / argsort / inverse / gathers."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.traverse.stream import stream_sort_keys


def _inverse_perm(perm):
    iota = jnp.arange(perm.shape[0], dtype=perm.dtype)
    return jnp.zeros_like(perm).at[perm].set(iota, unique_indices=True)
from embree_tpu.core.rayhit import Rays

n = 1 << 20
REPS = 6
lo = jnp.asarray(np.float32([-3, -3, -3]))
hi = jnp.asarray(np.float32([3, 3, 3]))


def mkrays(seed):
    r = np.random.default_rng(seed)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = r.uniform(-3.0, 3.0, (n, 3)).astype(np.float32)
    return et.make_rays(org, d)


raysets = [mkrays(i) for i in range(REPS)]


def timeit(name, f, argsets):
    jax.block_until_ready(f(*argsets[0]))
    t0 = time.perf_counter()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(argsets)
    print(f"{name:44s} {dt*1e3:8.2f} ms")


@jax.jit
def f_keys(r):
    return stream_sort_keys(r, lo, hi)


timeit("keys only", f_keys, [(r,) for r in raysets])

keysets = [f_keys(r) for r in raysets]
jax.block_until_ready(keysets)


@jax.jit
def f_argsort(k):
    return jnp.argsort(k)


timeit("argsort u32", f_argsort, [(k,) for k in keysets])

permsets = [f_argsort(k) for k in keysets]
jax.block_until_ready(permsets)


@jax.jit
def f_inv_scatter(p):
    return _inverse_perm(p)


timeit("inverse via scatter", f_inv_scatter, [(p,) for p in permsets])


@jax.jit
def f_inv_argsort(p):
    return jnp.argsort(p)


timeit("inverse via argsort", f_inv_argsort, [(p,) for p in permsets])


@jax.jit
def f_gather8(r, p):
    org = r.org.reshape(-1, 3)[p]
    d = r.dir.reshape(-1, 3)[p]
    tn = r.tnear.reshape(-1)[p]
    tf = r.tfar.reshape(-1)[p]
    return org, d, tn, tf


timeit("8-component ray gather", f_gather8,
       list(zip(raysets, permsets)))


@jax.jit
def f_gather1(r, p):
    return r.tnear.reshape(-1)[p]


timeit("1-component gather (1M f32)", f_gather1,
       list(zip(raysets, permsets)))


# sort with payloads instead of gather
@jax.jit
def f_sortpay(r, k):
    org = r.org.reshape(-1, 3)
    d = r.dir.reshape(-1, 3)
    outs = jax.lax.sort((k, org[:, 0], org[:, 1], org[:, 2],
                         d[:, 0], d[:, 1], d[:, 2],
                         r.tnear.reshape(-1), r.tfar.reshape(-1),
                         jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    return outs[1:]


timeit("lax.sort key + 9 payloads", f_sortpay,
       list(zip(raysets, keysets)))
