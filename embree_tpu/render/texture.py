"""Texture sampling (tutorials/common/texture/texture2d analog).

Textures are stacked into one padded array so a whole wavefront samples
with a single gather; bilinear or nearest filtering with repeat wrap —
the texture2d.cpp sampling modes. MTL `map_Kd` images load through
render/image.py (PPM/PFM natively; PNG via matplotlib when present).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TextureSet(NamedTuple):
    data: jnp.ndarray    # (T, Hmax, Wmax, 3) f32
    size: jnp.ndarray    # (T, 2) i32 (h, w)

    @property
    def num_textures(self):
        return self.data.shape[0]


def make_texture_set(images: list) -> TextureSet:
    """images: list of (H, W, 3) float arrays (empty -> 1 white texel)."""
    if not images:
        images = [np.ones((1, 1, 3), np.float32)]
    hmax = max(im.shape[0] for im in images)
    wmax = max(im.shape[1] for im in images)
    data = np.zeros((len(images), hmax, wmax, 3), np.float32)
    size = np.zeros((len(images), 2), np.int32)
    for i, im in enumerate(images):
        im = np.asarray(im, np.float32)
        if im.dtype == np.uint8:
            im = im / 255.0
        data[i, :im.shape[0], :im.shape[1]] = im[..., :3]
        size[i] = (im.shape[0], im.shape[1])
    return TextureSet(jnp.asarray(data), jnp.asarray(size))


def sample_texture(ts: TextureSet, tex_id, u, v, bilinear: bool = True):
    """Sample texture `tex_id` (per-lane i32) at (u, v) with repeat wrap.
    v follows the reference convention (v=0 at the bottom row)."""
    h = ts.size[tex_id, 0].astype(jnp.float32)
    w = ts.size[tex_id, 1].astype(jnp.float32)
    uu = (u % 1.0) * w - 0.5
    vv = ((1.0 - (v % 1.0)) % 1.0) * h - 0.5

    if not bilinear:
        x = jnp.clip(jnp.round(uu), 0, w - 1).astype(jnp.int32)
        y = jnp.clip(jnp.round(vv), 0, h - 1).astype(jnp.int32)
        return ts.data[tex_id, y, x]

    x0 = jnp.floor(uu)
    y0 = jnp.floor(vv)
    fx = (uu - x0)[..., None]
    fy = (vv - y0)[..., None]

    def texel(xi, yi):
        x = (xi.astype(jnp.int32) % jnp.maximum(w.astype(jnp.int32), 1))
        y = (yi.astype(jnp.int32) % jnp.maximum(h.astype(jnp.int32), 1))
        return ts.data[tex_id, y, x]

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    return (c00 * (1 - fx) * (1 - fy) + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy + c11 * fx * fy)


def sample_bilinear(tex, u, v):
    """Differentiable bilinear sample of ONE (H, W) or (H, W, C) jnp
    texture at (u, v) in [0,1] (repeat wrap, v=0 at the bottom row —
    texture2d semantics). Gradients flow to `tex`, so a displacement
    TEXTURE can be a trainable parameter (the map_Displ analog,
    obj_loader.cpp:423-425, through the differentiable commit path)."""
    tex = jnp.asarray(tex)
    chan = tex.ndim == 3
    h, w = tex.shape[0], tex.shape[1]
    uu = (u % 1.0) * w - 0.5
    vv = ((1.0 - (v % 1.0)) % 1.0) * h - 0.5
    i0 = jnp.floor(vv).astype(jnp.int32)
    j0 = jnp.floor(uu).astype(jnp.int32)
    fi = vv - i0
    fj = uu - j0
    i0m = i0 % h
    i1m = (i0 + 1) % h
    j0m = j0 % w
    j1m = (j0 + 1) % w
    a00 = tex[i0m, j0m]
    a01 = tex[i0m, j1m]
    a10 = tex[i1m, j0m]
    a11 = tex[i1m, j1m]
    if chan:
        fi = fi[..., None]
        fj = fj[..., None]
    return (a00 * (1 - fi) * (1 - fj) + a01 * (1 - fi) * fj
            + a10 * fi * (1 - fj) + a11 * fi * fj)
