"""Material table + BSDF sampling (SoA, wavefront-friendly).

Parity subset of the reference pathtracer's material zoo
(tutorials/pathtracer/pathtracer_device.cpp:458-760, 13 types): OBJ
(diffuse + phong specular + transparency, the loader's default), MATTE,
MIRROR, THIN_DIELECTRIC and EMITTER cover the tutorial scenes. All
materials live in one SoA table; sampling/eval are branch-free masked
ops over the whole wavefront (the TPU analog of the reference's
per-material virtual dispatch).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MAT_MATTE = 0
MAT_OBJ = 1
MAT_MIRROR = 2
MAT_DIELECTRIC = 3
MAT_EMITTER = 4


class MaterialTable(NamedTuple):
    type: jnp.ndarray   # (M,) i32
    kd: jnp.ndarray     # (M, 3) diffuse
    ks: jnp.ndarray     # (M, 3) specular / mirror reflectance
    ns: jnp.ndarray     # (M,) phong exponent
    d: jnp.ndarray      # (M,) opacity (OBJ "d")
    eta: jnp.ndarray    # (M,) ior for dielectric
    le: jnp.ndarray     # (M, 3) emission


def make_material_table(mats: list[dict]) -> MaterialTable:
    n = max(len(mats), 1)
    t = np.zeros(n, np.int32)
    kd = np.full((n, 3), 0.5, np.float32)
    ks = np.zeros((n, 3), np.float32)
    ns = np.full(n, 10.0, np.float32)
    d = np.ones(n, np.float32)
    eta = np.full(n, 1.5, np.float32)
    le = np.zeros((n, 3), np.float32)
    for i, m in enumerate(mats):
        t[i] = m.get("type", MAT_OBJ)
        kd[i] = m.get("kd", (0.5, 0.5, 0.5))
        ks[i] = m.get("ks", (0.0, 0.0, 0.0))
        ns[i] = m.get("ns", 10.0)
        d[i] = m.get("d", 1.0)
        eta[i] = m.get("eta", 1.5)
        le[i] = m.get("le", (0.0, 0.0, 0.0))
    return MaterialTable(*map(jnp.asarray, (t, kd, ks, ns, d, eta, le)))


def _ortho_basis(n):
    """Branchless ONB (Duff et al. / pixar)."""
    s = jnp.where(n[..., 2] >= 0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack([1.0 + s * n[..., 0] ** 2 * a, s * b, -s * n[..., 0]], -1)
    t2 = jnp.stack([b, s + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t1, t2


def cosine_sample(n, u1, u2):
    """Cosine-weighted hemisphere around n; returns (dir, pdf)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * np.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    t1, t2 = _ortho_basis(n)
    d = x[..., None] * t1 + y[..., None] * t2 + z[..., None] * n
    pdf = jnp.maximum(z / np.pi, 1e-6)
    return d, pdf


def reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n


def eval_brdf(mt: MaterialTable, mid, wo, ns_normal, wi):
    """f(wo, wi) * cos(wi) for NEE (diffuse + phong lobes)."""
    cos_i = jnp.maximum(jnp.sum(wi * ns_normal, -1), 0.0)
    kd = mt.kd[mid]
    diffuse = kd / np.pi * cos_i[..., None]
    # phong specular
    r = reflect(-wo, ns_normal)
    spec_cos = jnp.maximum(jnp.sum(wi * r, -1), 0.0)
    nsx = mt.ns[mid]
    phong = mt.ks[mid] * ((nsx + 2) / (2 * np.pi)
                          * spec_cos ** nsx * cos_i)[..., None]
    t = mt.type[mid]
    f = jnp.where((t == MAT_MATTE)[..., None], diffuse, 0.0)
    f = jnp.where((t == MAT_OBJ)[..., None], diffuse + phong, f)
    # mirror / dielectric have delta BSDFs -> no NEE contribution
    return f


def sample_bsdf(mt: MaterialTable, mid, wo, ns_normal, key):
    """Sample continuation direction; returns (wi, weight, is_delta)."""
    k1, k2, k3 = jax.random.split(key, 3)
    shape = mid.shape
    u1 = jax.random.uniform(k1, shape)
    u2 = jax.random.uniform(k2, shape)
    u3 = jax.random.uniform(k3, shape)

    t = mt.type[mid]
    kd = mt.kd[mid]
    ks = mt.ks[mid]

    # diffuse lobe
    wi_d, _pdf_d = cosine_sample(ns_normal, u1, u2)
    w_d = kd  # (kd/pi * cos) / (cos/pi)

    # mirror lobe
    wi_m = reflect(-wo, ns_normal)
    w_m = jnp.where(jnp.sum(ks, -1, keepdims=True) > 0, ks, kd)

    # dielectric: reflect or refract by fresnel (thin approximation:
    # refraction continues straight through, the reference's
    # ThinDielectric transmission)
    cos_o = jnp.clip(jnp.sum(wo * ns_normal, -1), -1.0, 1.0)
    eta = mt.eta[mid]
    r0 = ((1 - eta) / (1 + eta)) ** 2
    fres = r0 + (1 - r0) * (1 - jnp.abs(cos_o)) ** 5
    refl = u3 < fres
    wi_g = jnp.where(refl[..., None], wi_m, -wo)
    w_g = jnp.ones_like(kd)

    # OBJ: choose diffuse vs specular by energy
    pd = jnp.sum(kd, -1)
    psum = pd + jnp.sum(ks, -1)
    p_diff = jnp.where(psum > 0, pd / jnp.maximum(psum, 1e-6), 1.0)
    choose_d = u3 < p_diff
    # phong sample approximated by mirror lobe scaled (adequate for the
    # tutorial scenes; exact power-lobe sampling lands with the full
    # material zoo)
    wi_o = jnp.where(choose_d[..., None], wi_d, wi_m)
    w_o = jnp.where(choose_d[..., None],
                    kd / jnp.maximum(p_diff, 1e-6)[..., None],
                    ks / jnp.maximum(1 - p_diff, 1e-6)[..., None])

    wi = jnp.where((t == MAT_MIRROR)[..., None], wi_m, wi_d)
    w = jnp.where((t == MAT_MIRROR)[..., None], w_m, w_d)
    wi = jnp.where((t == MAT_OBJ)[..., None], wi_o, wi)
    w = jnp.where((t == MAT_OBJ)[..., None], w_o, w)
    wi = jnp.where((t == MAT_DIELECTRIC)[..., None], wi_g, wi)
    w = jnp.where((t == MAT_DIELECTRIC)[..., None], w_g, w)
    is_delta = (t == MAT_MIRROR) | (t == MAT_DIELECTRIC) \
        | ((t == MAT_OBJ) & ~choose_d)
    return wi, w, is_delta
