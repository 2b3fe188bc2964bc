"""Catmull-Clark subdivision correctness (reference kernels/subdiv analog;
interpolation ground-truth tests modeled on verify.cpp:1772 Interpolate-
SubdivTest)."""
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.subdiv.core import (apply_stencil_jnp, evaluate_plan,
                                    plan_subdivision)
from embree_tpu.subdiv.tessellate import (build_patch_grids,
                                          tessellate_mesh_to_triangles,
                                          vertex_normals)
from embree_tpu.verify.fixtures import subdiv_cube


def _cube_plan(levels, **kw):
    verts, counts, indices = subdiv_cube()
    plan = plan_subdivision(counts, indices, verts.shape[0], levels, **kw)
    return verts, plan


def test_vertex_counts():
    # cube: level1 = 6 faces + 12 edges + 8 verts = 26
    verts, plan = _cube_plan(1)
    assert plan.num_final_vertices == 26
    out = evaluate_plan(plan, verts)
    assert out.shape == (26, 3)
    # level 2: F=24, E=48, V=26 -> 98
    verts, plan = _cube_plan(2)
    assert plan.num_final_vertices == 98


def test_smooth_cube_shrinks_smoothly():
    verts, plan = _cube_plan(4)
    out = evaluate_plan(plan, verts)
    r = np.linalg.norm(out, axis=1)
    # smooth CC limit of a cube lies strictly inside the cube, outside a
    # small sphere; no spikes
    assert r.max() < np.sqrt(3.0) - 0.05
    assert r.min() > 0.4
    assert np.isfinite(out).all()


def test_quads_cover_all_vertices():
    verts, plan = _cube_plan(3)
    q = plan.final_quads
    assert q.min() >= 0
    used = np.zeros(plan.num_final_vertices, bool)
    used[q.reshape(-1)] = True
    assert used.all()


def test_single_quad_boundary_bilinear():
    """One boundary quad: subdivision limit is the bilinear patch; corners
    pinned, grid (i, j) == (i/g, j/g)."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    counts = np.array([4], np.int32)
    idx = np.array([0, 1, 2, 3], np.int32)
    plan = plan_subdivision(counts, idx, 4, 3)
    out = evaluate_plan(plan, verts)
    assert np.abs(out[:, 2]).max() < 1e-6  # planar
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6
    # corners pinned
    for c in verts:
        assert np.min(np.linalg.norm(out - c, axis=1)) < 1e-6

    grids = build_patch_grids(plan)
    g = grids.grid_res
    assert grids.grids.shape == (1, g + 1, g + 1)
    assert (grids.grids >= 0).all(), "grid has holes"
    pos = out[grids.grids[0]]
    ii, jj = np.meshgrid(np.arange(g + 1), np.arange(g + 1), indexing="ij")
    np.testing.assert_allclose(pos[..., 0], ii / g, atol=1e-5)
    np.testing.assert_allclose(pos[..., 1], jj / g, atol=1e-5)


def test_sharp_cube_stays_cube():
    """All edges infinitely creased -> subdivision preserves the box."""
    verts, counts, indices = subdiv_cube()
    # crease every edge of every face
    edges = []
    off = 0
    for n in counts:
        f = indices[off:off + n]
        for k in range(n):
            edges.append((f[k], f[(k + 1) % n]))
        off += n
    edges = np.asarray(edges, np.int64)
    w = np.full(edges.shape[0], 100.0, np.float32)
    plan = plan_subdivision(counts, indices, verts.shape[0], 3,
                            edge_creases=edges, edge_crease_weights=w)
    out = evaluate_plan(plan, verts)
    assert np.abs(np.abs(out).max(1) - 1.0).max() < 1e-6, \
        "sharp cube must keep |max coord| == 1"


def test_patch_grids_cube_full_coverage():
    verts, plan = _cube_plan(3)
    grids = build_patch_grids(plan)
    assert grids.grids.shape[0] == 6  # one patch per quad face
    assert (grids.grids >= 0).all()
    out = evaluate_plan(plan, verts)
    # grid neighbors are geometrically close (continuity / no scrambling)
    pos = out[grids.grids]  # (6, g+1, g+1, 3)
    step = np.linalg.norm(np.diff(pos, axis=1), axis=-1)
    assert step.max() < 0.5


def test_jax_eval_matches_numpy_and_differentiates():
    import jax
    import jax.numpy as jnp
    verts, plan = _cube_plan(2)
    out_np = evaluate_plan(plan, verts)
    out_j = evaluate_plan(plan, jnp.asarray(verts), use_jax=True)
    np.testing.assert_allclose(np.asarray(out_j), out_np, rtol=1e-6, atol=1e-6)

    def loss(v):
        return jnp.sum(evaluate_plan(plan, v, use_jax=True) ** 2)

    g = jax.grad(loss)(jnp.asarray(verts))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_scene_commit_subdiv_and_render(rng):
    verts, counts, indices = subdiv_cube()
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.SubdivMesh(verts, counts, indices))
    scene.set_levels(3, 2)
    cs = scene.commit()
    assert cs.tris.num_prims == 2 * 6 * 4 ** 3  # 2 tris x 6 faces x 4^L quads

    # rays from outside toward center must hit the smooth cube
    org = np.array([[3.0, 0.1, 0.1]], np.float32)
    d = np.array([[-1.0, 0.0, 0.0]], np.float32)
    hits = scene.intersect(et.make_rays(org, d))
    assert bool(hits.valid[0])
    assert 2.0 < float(hits.t[0]) < 3.0


def test_displacement():
    verts, counts, indices = subdiv_cube()

    def displ(p, ng, u, v):
        return p + 0.1 * ng  # inflate along normals

    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.SubdivMesh(verts, counts, indices, displacement=displ))
    scene.set_levels(3, 2)
    cs = scene.commit()
    scene2 = et.Scene(dev)
    scene2.attach(et.SubdivMesh(verts, counts, indices))
    scene2.set_levels(3, 2)
    cs2 = scene2.commit()
    r1 = np.linalg.norm(np.asarray(cs.tris.v0), axis=1).mean()
    r2 = np.linalg.norm(np.asarray(cs2.tris.v0), axis=1).mean()
    assert r1 > r2 + 0.05
