"""Ray-stream reordering (octant + origin-morton sort).

The analog of the reference's stream traversal front end
(kernels/bvh/bvh_intersector_stream.{h,cpp} + stream filters): large ray
batches are sorted into coherent groups before packetization — direction
octant first (the stream traverser's octant partition,
bvh_intersector_stream.h:44-113), then 30-bit morton code of the
quantized origin. Shared-stack packets then see far fewer unique nodes.
Sorting is a device-side argsort (one fused XLA op), costing a small
fraction of traversal.
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


@jax.jit
def sort_rays(rays: Rays, world_lower, world_upper):
    """Returns (sorted_rays, inverse_permutation). Jitted standalone so
    the eager-call path (bench/tutorial drivers) doesn't pay per-op
    dispatch."""
    keys = stream_sort_keys(rays, world_lower, world_upper)
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    org = rays.org.reshape(-1, 3)[perm]
    d = rays.dir.reshape(-1, 3)[perm]
    tn = rays.tnear.reshape(-1)[perm]
    tf = rays.tfar.reshape(-1)[perm]
    return Rays(org, d, tn, tf), inv


@jax.jit
def sort_rays_perm(rays: Rays, world_lower, world_upper):
    """Like sort_rays but also returns the forward permutation, for
    callers that must co-sort per-ray payloads (e.g. MB ray times)."""
    keys = stream_sort_keys(rays, world_lower, world_upper)
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    org = rays.org.reshape(-1, 3)[perm]
    d = rays.dir.reshape(-1, 3)[perm]
    tn = rays.tnear.reshape(-1)[perm]
    tf = rays.tfar.reshape(-1)[perm]
    return Rays(org, d, tn, tf), perm, inv


def unsort(x, inv):
    return x[inv]
