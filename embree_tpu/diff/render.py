"""User-facing differentiable rendering: pixels -> cage vertices,
displacement parameters, and material parameters.

Closes the loop BASELINE.md asks for ("grads w.r.t. vertex positions,
displacement, materials through the shading/hit path"): the commit-time
tessellation (subdiv/core.py refinement + limit projection + mesh-level
displacement) is re-expressed as traced jnp ops, so one jax.grad flows
from a pixel loss back through shading -> hit re-evaluation
(diff/hit.py) -> triangle soup -> displaced limit surface -> control
cage / displacement params / material color. Hit *selection* stays
discrete (stop_gradient), exactly the reference's REFIT-vs-rebuild split
(the displacement callback crossing in subdivpatch1base_eval.cpp:139-156
is replaced by displacement-as-jax-function).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.rayhit import Rays
from ..scene.prims import TrianglePrims
from ..subdiv.cache import global_cache, plan_nbytes, topology_key
from ..subdiv.core import (apply_limit_stencil, evaluate_plan,
                           limit_stencil, plan_subdivision,
                           vertex_normals_jnp)
from .hit import reeval_hit


class DiffSubdivRenderer:
    """Differentiable renderer over one SubdivMesh.

    Build once (topology + ray set + frozen hit selection), then call
    `render(cage_verts, disp_params, kd)` inside jit/grad. The frozen
    selection is refreshed with `refresh_selection()` after large
    parameter steps (the BVH refit analog)."""

    def __init__(self, mesh, rays: Rays, level: int = 3,
                 displacement: Optional[Callable] = None,
                 light_dir=(1.0, -1.0, 1.0), isa: str = "default"):
        import embree_tpu as et

        self.mesh = mesh
        self.rays = rays
        self.displacement = displacement
        self.isa = isa
        ld = np.asarray(light_dir, np.float32)
        self.light_dir = jnp.asarray(ld / np.linalg.norm(ld))

        nv = int(np.asarray(mesh.vertices).shape[0])
        key = topology_key(mesh.face_counts, mesh.face_indices, nv, level,
                           mesh.edge_creases, mesh.edge_crease_weights,
                           mesh.vertex_creases, mesh.vertex_crease_weights)
        self.plan = global_cache().get_or_build(
            ("plan", key),
            lambda: plan_subdivision(
                mesh.face_counts, mesh.face_indices, nv, level,
                edge_creases=mesh.edge_creases,
                edge_crease_weights=mesh.edge_crease_weights,
                vertex_creases=mesh.vertex_creases,
                vertex_crease_weights=mesh.vertex_crease_weights),
            plan_nbytes)
        self.stencil = limit_stencil(self.plan)
        self.quads = np.asarray(self.plan.final_quads)
        self._et = et
        self.level = level
        self.selection = None

    # --- differentiable tessellation (the traced commit path) ----------
    def soup(self, cage_verts, disp_params=None) -> TrianglePrims:
        """cage -> refined -> limit -> displaced -> triangle soup, all
        traced (tessellate_mesh_to_triangles' jax twin, same prim
        order)."""
        verts = evaluate_plan(self.plan, cage_verts, use_jax=True)
        verts = apply_limit_stencil(self.stencil, verts)
        if self.displacement is not None:
            normals = vertex_normals_jnp(verts, self.quads)
            verts = self.displacement(verts, normals, disp_params)
        q = self.quads
        p0, p1, p2, p3 = (verts[q[:, 0]], verts[q[:, 1]], verts[q[:, 2]],
                          verts[q[:, 3]])
        v0 = jnp.concatenate([p0, p2])
        v1 = jnp.concatenate([p1, p3])
        v2 = jnp.concatenate([p3, p1])
        T = v0.shape[0]
        zeros = jnp.zeros((T,), jnp.int32)
        return TrianglePrims(v0, v1, v2, zeros,
                             jnp.arange(T, dtype=jnp.int32), zeros)

    def refresh_selection(self, cage_verts, disp_params=None):
        """Eager forward trace: commit a real scene at the current
        parameters and freeze the per-ray winning primitive."""
        et = self._et
        tris = jax.tree.map(
            lambda x: np.asarray(jax.lax.stop_gradient(x)),
            self.soup(jnp.asarray(cage_verts, jnp.float32), disp_params))
        dev = et.Device("ignore_config_files=1")
        scene = et.Scene(dev)
        verts = np.stack([tris.v0, tris.v1, tris.v2],
                         axis=1).reshape(-1, 3)
        idx = np.arange(verts.shape[0]).reshape(-1, 3)
        scene.attach(et.TriangleMesh(verts, idx))
        cs = scene.commit()
        from ..scene.scene import scene_intersect
        sel = scene_intersect(cs, self.rays, isa=self.isa)
        self.selection = jax.tree.map(jax.lax.stop_gradient,
                                      (sel.gprim, sel.valid))
        return self.selection

    def render(self, cage_verts, disp_params=None, kd=(0.8, 0.8, 0.8)):
        """Differentiable image: lambert shading of the frozen hit
        selection re-evaluated against the traced soup."""
        if self.selection is None:
            raise RuntimeError("call refresh_selection() first")
        gprim, valid = self.selection
        tris = self.soup(cage_verts, disp_params)
        h = reeval_hit(tris, self.rays, gprim, valid)
        n = h.ng
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                            1e-20)
        # two-sided lambert: |n . l|
        ndotl = jnp.abs(jnp.sum(n * self.light_dir, axis=-1))
        kd = jnp.asarray(kd, jnp.float32)
        img = jnp.where(valid[..., None], kd * ndotl[..., None], 0.0)
        return img

    def loss(self, cage_verts, disp_params=None, kd=(0.8, 0.8, 0.8),
             target=None):
        img = self.render(cage_verts, disp_params, kd)
        if target is None:
            return jnp.sum(img)
        return jnp.mean((img - target) ** 2)


def make_train_step(renderer: DiffSubdivRenderer, target, lr: float = 1e-2):
    """One-line SGD train step over (cage_verts, disp_params, kd)."""

    @jax.jit
    def step(params):
        cage, disp, kd = params
        loss, grads = jax.value_and_grad(
            lambda c, d, k: renderer.loss(c, d, k, target=target),
            argnums=(0, 1, 2))(cage, disp, kd)
        new = tuple(jax.tree.map(lambda p, g: p - lr * g, p_, g_)
                    for p_, g_ in zip((cage, disp, kd), grads))
        return new, loss

    return step
