"""Flattened primitive arrays shared by builders and traversal kernels.

The analog of the reference's reordered PrimRef leaves: at commit time the
scene flattens every triangle/quad geometry into one global SoA triangle
soup (quads become two triangles sharing an edge with a uv-flip flag,
matching the reference Quad4v convention, kernels/geometry/quadv.h).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TrianglePrims(NamedTuple):
    v0: jnp.ndarray       # (T, 3) f32
    v1: jnp.ndarray       # (T, 3) f32
    v2: jnp.ndarray       # (T, 3) f32
    geom_id: jnp.ndarray  # (T,) i32
    prim_id: jnp.ndarray  # (T,) i32 prim index inside its geometry
    uv_flip: jnp.ndarray  # (T,) i32 1 => second quad triangle: uv -> 1-uv

    @property
    def num_prims(self):
        return self.v0.shape[0]


def empty_triangle_prims() -> TrianglePrims:
    z3 = jnp.zeros((0, 3), jnp.float32)
    zi = jnp.zeros((0,), jnp.int32)
    return TrianglePrims(z3, z3, z3, zi, zi, zi)


def prim_bounds_np(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray):
    lower = np.minimum(np.minimum(v0, v1), v2)
    upper = np.maximum(np.maximum(v0, v1), v2)
    return lower, upper
