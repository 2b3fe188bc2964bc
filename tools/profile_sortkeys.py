"""A/B ray-sort key compositions: how much tree does a packet visit?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import embree_tpu as et
from embree_tpu.build.morton import morton3d
from embree_tpu.core.rayhit import Rays
from embree_tpu.traverse.pallas_packet import (_ray_tiles, _run_intersect)
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
lo, hi = cs.world_lower, cs.world_upper


def qmorton(p, lo, hi, bits):
    ext = jnp.maximum(hi - lo, 1e-20)
    s = (1 << bits) - 1
    q = jnp.clip((p - lo) / ext * s, 0.0, float(s))
    return morton3d(q[:, 0].astype(jnp.uint32), q[:, 1].astype(jnp.uint32),
                    q[:, 2].astype(jnp.uint32))


def keys_current(r):
    d = r.dir.reshape(-1, 3)
    org = r.org.reshape(-1, 3)
    octant = ((d[:, 0] < 0).astype(jnp.uint32)
              | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
    return (octant << 30) | qmorton(org, lo, hi, 10)


def keys_dir(bits_d, bits_o):
    def f(r):
        d = r.dir.reshape(-1, 3)
        org = r.org.reshape(-1, 3)
        octant = ((d[:, 0] < 0).astype(jnp.uint32)
                  | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
                  | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
        dm = qmorton(jnp.abs(d), jnp.zeros(3), jnp.ones(3), bits_d)
        om = qmorton(org, lo, hi, bits_o)
        return (octant << 29) | (dm << (3 * bits_o)) | om
    return f


def keys_dirfirst_o(bits_d, bits_o):
    # interleave? simple: dir morton high, origin low
    return keys_dir(bits_d, bits_o)


variants = {
    "oct+org10 (current)": keys_current,
    "oct+dir3+org6": keys_dir(3, 6),
    "oct+dir5+org4": keys_dir(5, 4),
    "oct+dir8+org1": keys_dir(8, 1),
    "oct+dir2+org7": keys_dir(2, 7),
}


def timeit(name, f, argsets):
    out0 = jax.block_until_ready(f(*argsets[0]))
    t0 = time.perf_counter()
    outs = [f(*a) for a in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(argsets)
    stats = np.asarray(out0[2])
    print(f"{name:28s} {dt*1e3:8.2f} ms  {n/dt/1e6:7.2f} Mray/s  "
          f"iters tot={stats[:,0].sum()}  ltests tot={stats[:,1].sum()}")


for name, kf in variants.items():
    def run(r, kf=kf):
        keys = kf(r)
        org = r.org.reshape(-1, 3)
        d = r.dir.reshape(-1, 3)
        out = jax.lax.sort((keys, org[:, 0], org[:, 1], org[:, 2],
                            d[:, 0], d[:, 1], d[:, 2],
                            r.tnear.reshape(-1), r.tfar.reshape(-1)),
                           num_keys=1)
        srays = Rays(jnp.stack(out[1:4], -1), jnp.stack(out[4:7], -1),
                     out[7], out[8])
        tiles, R, nb = _ray_tiles(srays)
        return _run_intersect(cs.pallas, tiles, nb)

    fj = jax.jit(run)
    timeit(name, fj, [(r,) for r in raysets])
