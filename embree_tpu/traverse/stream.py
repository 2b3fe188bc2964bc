"""Ray-stream reordering (octant + origin-morton sort).

The analog of the reference's stream traversal front end
(kernels/bvh/bvh_intersector_stream.{h,cpp} + stream filters): large ray
batches are sorted into coherent groups before packetization — direction
octant first (the stream traverser's octant partition,
bvh_intersector_stream.h:44-113), then 30-bit morton code of the
quantized origin. Shared-stack packets then see far fewer unique nodes.

Implementation note (v5e, measured): random gathers cost ~12 ms per
gather op at 1M elements regardless of row width, while an XLA
`lax.sort` moving the same data as sort payloads costs ~10 ms TOTAL.
So both directions of the reorder ride the sort network:
  * forward: one lax.sort with the 8 ray components (+ original index)
    as payloads — no gathers;
  * inverse ("unsort"): one lax.sort keyed on the original index with
    (t, prim) as payloads — replaces two 13 ms gathers with ~7 ms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..build.morton import morton3d
from ..core.rayhit import Rays


def stream_sort_keys(rays: Rays, world_lower, world_upper) -> jnp.ndarray:
    """(R,) sort keys: octant(dir) in the top bits, origin morton below."""
    d = rays.dir.reshape(-1, 3)
    org = rays.org.reshape(-1, 3)
    octant = ((d[:, 0] < 0).astype(jnp.uint32)
              | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
    ext = jnp.maximum(world_upper - world_lower, 1e-20)
    q = jnp.clip((org - world_lower) / ext * 1023.0, 0.0, 1023.0)
    code = morton3d(q[:, 0].astype(jnp.uint32), q[:, 1].astype(jnp.uint32),
                    q[:, 2].astype(jnp.uint32))
    return (octant << 30) | code


def _sort_with_rays(keys: jnp.ndarray, rays: Rays):
    """One stable lax.sort carrying the ray components + original index
    as payloads. Returns (sorted_rays, perm)."""
    org = rays.org.reshape(-1, 3)
    d = rays.dir.reshape(-1, 3)
    tn = rays.tnear.reshape(-1)
    tf = rays.tfar.reshape(-1)
    iota = jnp.arange(tn.shape[0], dtype=jnp.int32)
    out = jax.lax.sort(
        (keys, org[:, 0], org[:, 1], org[:, 2],
         d[:, 0], d[:, 1], d[:, 2], tn, tf, iota), num_keys=1)
    srays = Rays(jnp.stack(out[1:4], axis=-1), jnp.stack(out[4:7], axis=-1),
                 out[7], out[8])
    return srays, out[9]


def sort_rays(rays: Rays, world_lower, world_upper):
    """Returns (sorted_rays, inverse_permutation)."""
    srays, _perm, inv = sort_rays_perm(rays, world_lower, world_upper)
    return srays, inv


@jax.jit
def sort_rays_perm(rays: Rays, world_lower, world_upper):
    """Returns (sorted_rays, perm, inv); jitted standalone so the
    eager-call path (bench/tutorial drivers) doesn't pay per-op dispatch.
    `perm` lets callers co-sort per-ray payloads (e.g. MB ray times)."""
    keys = stream_sort_keys(rays, world_lower, world_upper)
    srays, perm = _sort_with_rays(keys, rays)
    inv = jnp.argsort(perm)
    return srays, perm, inv


@jax.jit
def sort_rays_stream(rays: Rays, world_lower, world_upper):
    """Stream-order variant: returns (sorted_rays, perm) WITHOUT the
    inverse permutation — for consumers that stay in stream order
    (unsorting via `unsort_by_perm` or not at all)."""
    keys = stream_sort_keys(rays, world_lower, world_upper)
    return _sort_with_rays(keys, rays)


def unsort_by_perm(perm: jnp.ndarray, *arrays: jnp.ndarray):
    """Restore original ray order for per-ray result arrays with one
    payload sort keyed on the original index (a 1M gather is ~13 ms per
    array; this sort is ~7 ms total). Bools ride as i32 payloads (XLA
    sort payload dtypes are limited on TPU). Returns one array or a
    tuple, matching the arity."""
    bools = [a.dtype == jnp.bool_ for a in arrays]
    pay = tuple(a.astype(jnp.int32) if b else a
                for a, b in zip(arrays, bools))
    out = jax.lax.sort((perm,) + pay, num_keys=1)[1:]
    out = tuple(o.astype(jnp.bool_) if b else o
                for o, b in zip(out, bools))
    return out[0] if len(out) == 1 else out


def unsort_one(perm: jnp.ndarray, x: jnp.ndarray):
    return unsort_by_perm(perm, x)


def unsort(x, inv):
    return x[inv]
