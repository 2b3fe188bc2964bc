"""Light table + next-event-estimation sampling.

The reference's light vtable set (tutorials/common/lights: point, spot,
quad/area, directional, ambient, each with sample/eval) as one SoA table;
sampling is vectorized over the wavefront and light index (small static
light counts, like the tutorial scenes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LIGHT_POINT = 0
LIGHT_SPOT = 1
LIGHT_QUAD = 2
LIGHT_DIRECTIONAL = 3
# ambient is handled as environment radiance on miss


@jax.tree_util.register_pytree_node_class
class LightTable:
    """SoA light table; `type` is static pytree aux data (the light kinds
    select code paths, like the reference's per-light vtables)."""

    def __init__(self, type, pos, e1, e2, radiance, angles, ambient):
        self.type = tuple(int(t) for t in np.asarray(type))
        self.pos = pos            # (L, 3) position / quad corner
        self.e1 = e1              # (L, 3) quad edge 1 / spot direction
        self.e2 = e2              # (L, 3) quad edge 2
        self.radiance = radiance  # (L, 3)
        self.angles = angles      # (L, 2) spot cos angles
        self.ambient = ambient    # (3,) environment radiance

    def tree_flatten(self):
        return ((self.pos, self.e1, self.e2, self.radiance, self.angles,
                 self.ambient), self.type)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.type = aux
        (obj.pos, obj.e1, obj.e2, obj.radiance, obj.angles,
         obj.ambient) = children
        return obj


def make_light_table(lights: list[dict],
                     ambient=(0.0, 0.0, 0.0)) -> LightTable:
    n = max(len(lights), 1)
    t = np.zeros(n, np.int32)
    pos = np.zeros((n, 3), np.float32)
    e1 = np.zeros((n, 3), np.float32)
    e2 = np.zeros((n, 3), np.float32)
    rad = np.zeros((n, 3), np.float32)
    ang = np.ones((n, 2), np.float32)
    for i, l in enumerate(lights):
        t[i] = l["type"]
        pos[i] = l.get("pos", (0, 0, 0))
        e1[i] = l.get("e1", l.get("dir", (0, -1, 0)))
        e2[i] = l.get("e2", (0, 0, 0))
        rad[i] = l.get("radiance", (1, 1, 1))
        ang[i] = l.get("cos_angles", (1.0, 0.9))
    return LightTable(t, jnp.asarray(pos), jnp.asarray(e1),
                      jnp.asarray(e2), jnp.asarray(rad), jnp.asarray(ang),
                      jnp.asarray(np.asarray(ambient, np.float32)))


def sample_light(lt: LightTable, li: int, p, key):
    """Sample light `li` (static index) from points p (R, 3).

    Returns (wi, dist, radiance_over_pdf) — the common/lights sample()
    contract."""
    ltype = lt.type[li]
    if ltype == LIGHT_POINT:
        d = lt.pos[li] - p
        dist2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
        dist = jnp.sqrt(dist2)
        wi = d / dist[..., None]
        return wi, dist, lt.radiance[li] / dist2[..., None]
    if ltype == LIGHT_SPOT:
        d = lt.pos[li] - p
        dist2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
        dist = jnp.sqrt(dist2)
        wi = d / dist[..., None]
        cos = jnp.sum(-wi * lt.e1[li], -1)
        c0, c1 = lt.angles[li, 0], lt.angles[li, 1]
        fall = jnp.clip((cos - c1) / jnp.maximum(c0 - c1, 1e-6), 0.0, 1.0)
        return wi, dist, lt.radiance[li] * (fall / dist2)[..., None]
    if ltype == LIGHT_DIRECTIONAL:
        wi = -lt.e1[li] / jnp.linalg.norm(lt.e1[li])
        dist = jnp.full(p.shape[:-1], 1e30, jnp.float32)
        return jnp.broadcast_to(wi, p.shape), dist, \
            jnp.broadcast_to(lt.radiance[li], p.shape)
    # quad/area light: uniform point on the parallelogram
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, p.shape[:-1])
    v = jax.random.uniform(k2, p.shape[:-1])
    q = lt.pos[li] + u[..., None] * lt.e1[li] + v[..., None] * lt.e2[li]
    ng = jnp.cross(lt.e1[li], lt.e2[li])
    area = jnp.linalg.norm(ng)
    ngn = ng / jnp.maximum(area, 1e-12)
    d = q - p
    dist2 = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
    dist = jnp.sqrt(dist2)
    wi = d / dist[..., None]
    cos_l = jnp.maximum(jnp.sum(-wi * ngn, -1), 0.0)
    # Le * cos_l * area / dist^2  (pdf = 1/area)
    w = lt.radiance[li] * (cos_l * area / dist2)[..., None]
    return wi, dist, w


def num_lights(lt: LightTable) -> int:
    return len(lt.type)
