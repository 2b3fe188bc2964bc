"""Bisect the slow stages of the fast path composition."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.traverse.pallas_packet import intersect_pallas_raw
from embree_tpu.traverse.stream import stream_sort_keys
from embree_tpu.core.rayhit import Rays
from embree_tpu.verify.fixtures import triangle_sphere

rng = np.random.default_rng(0xBE7C4)
verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, 40)
dev = et.Device("ignore_config_files=1")
scene = et.Scene(dev)
scene.attach(et.TriangleMesh(verts, idx))
cs = scene.commit()

n = 1 << 20
REPS = 6


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
    print(f"{name:46s} {dt*1e3:8.2f} ms")


wl, wu = cs.world_lower, cs.world_upper

# ---- sort-side bisection ----
timeit("k0 keys only", jax.jit(lambda r: stream_sort_keys(r, wl, wu)),
       [(r,) for r in raysets])
timeit("k1 keys+argsort", jax.jit(
    lambda r: jnp.argsort(stream_sort_keys(r, wl, wu))),
    [(r,) for r in raysets])


@jax.jit
def k2(r):
    perm = jnp.argsort(stream_sort_keys(r, wl, wu))
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return perm, inv


timeit("k2 + inv scatter", k2, [(r,) for r in raysets])


@jax.jit
def k2b(r):
    perm = jnp.argsort(stream_sort_keys(r, wl, wu))
    inv = jnp.argsort(perm)
    return perm, inv


timeit("k2b + inv argsort (current)", k2b, [(r,) for r in raysets])


@jax.jit
def k3(r):
    perm = jnp.argsort(stream_sort_keys(r, wl, wu))
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    srays = Rays(r.org[perm], r.dir[perm], r.tnear[perm], r.tfar[perm])
    return srays, perm, inv


timeit("k3 + 4 payload gathers (full sort)", k3, [(r,) for r in raysets])

# ---- kernel + unsort bisection ----
sorted_sets = [jax.block_until_ready(k3(r))[0] for r in raysets]


@jax.jit
def u0(sr):
    return intersect_pallas_raw(cs.pallas, sr)


timeit("u0 kernel only (pre-sorted)", u0, [(s,) for s in sorted_sets])

pi = [jax.block_until_ready(k2(r)) for r in raysets]


@jax.jit
def u1(sr, inv):
    t_s, prim_s = intersect_pallas_raw(cs.pallas, sr)
    return t_s[inv], prim_s[inv]


timeit("u1 kernel + unsort gather", u1,
       [(s, p[1]) for s, p in zip(sorted_sets, pi)])


@jax.jit
def u2(sr, perm):
    t_s, prim_s = intersect_pallas_raw(cs.pallas, sr)
    t = jnp.zeros_like(t_s).at[perm].set(t_s)
    pr = jnp.zeros_like(prim_s).at[perm].set(prim_s)
    return t, pr


timeit("u2 kernel + unsort scatter", u2,
       [(s, p[0]) for s, p in zip(sorted_sets, pi)])

# unsort alone on plain buffers (not kernel outputs)
ts = [jnp.asarray(np.random.default_rng(i).normal(
    size=(n,)).astype(np.float32)) for i in range(REPS)]


@jax.jit
def u3(t, inv):
    return t[inv]


timeit("u3 gather alone (plain input)", u3,
       [(t, p[1]) for t, p in zip(ts, pi)])
