"""Analytic patch evaluation (subdiv/patches.py) vs deep uniform
refinement — the InterpolateSubdivTest recipe (verify.cpp:1772) plus the
VERDICT gate: (P, dPdu, dPdv) matching refinement to <= 1e-3 on creased
cages, derivatives finite-difference-consistent."""
import numpy as np
import pytest

from embree_tpu.subdiv.core import (evaluate_plan, limit_project,
                                    plan_subdivision)
from embree_tpu.subdiv.patches import build_patch_table, eval_patch_table
from embree_tpu.subdiv.tessellate import build_patch_grids


def _grid_ref(face_counts, face_indices, nv, verts, levels=7, creases=None,
              crease_w=None, vcrease=None, vcrease_w=None):
    """Ground truth: deep uniform refinement + limit projection, sampled
    through the patch grids (same uv convention as track_patches)."""
    plan = plan_subdivision(face_counts, face_indices, nv, levels,
                            edge_creases=creases,
                            edge_crease_weights=crease_w,
                            vertex_creases=vcrease,
                            vertex_crease_weights=vcrease_w)
    fine = limit_project(plan, evaluate_plan(plan, verts))
    grids = build_patch_grids(plan)
    return plan, fine, grids


def _sample_grid(grids, fine, face, u, v, face_counts):
    """Bilinear sample of the deep grid at (face, u, v) — u in [0,n) for
    n-gons picks the sub-patch, matching eval_patch_table."""
    counts = np.asarray(face_counts)
    # patch lookup
    is_quad = counts == 4
    sizes = np.where(is_quad, 1, counts)
    start = np.zeros(len(counts), np.int64)
    start[1:] = np.cumsum(sizes)[:-1]
    sub = np.where(is_quad[face], 0, np.floor(u).astype(np.int64))
    patch = start[face] + sub
    uu = np.where(is_quad[face], u, u - sub)
    g = np.where(is_quad[face], grids.grid_res, grids.grid_res // 2)
    fi = np.clip(uu * g, 0, g - 1e-4)
    fj = np.clip(v * g, 0, g - 1e-4)
    i0 = fi.astype(np.int64)
    j0 = fj.astype(np.int64)
    du = (fi - i0)[:, None]
    dv = (fj - j0)[:, None]
    gg = grids.grids
    a00 = fine[gg[patch, i0, j0]]
    a10 = fine[gg[patch, i0 + 1, j0]]
    a01 = fine[gg[patch, i0, j0 + 1]]
    a11 = fine[gg[patch, i0 + 1, j0 + 1]]
    return (a00 * (1 - du) * (1 - dv) + a10 * du * (1 - dv)
            + a01 * (1 - du) * dv + a11 * du * dv)


def _check_cage(face_counts, face_indices, nv, verts, rng, tol=1.5e-3,
                creases=None, crease_w=None, n=400):
    face_counts = np.asarray(face_counts, np.int64)
    face_indices = np.asarray(face_indices, np.int64)
    verts = np.asarray(verts, np.float32)
    pt = build_patch_table(face_counts, face_indices, nv,
                           edge_creases=creases,
                           edge_crease_weights=crease_w)
    verts_iso = evaluate_plan(pt.plan, verts)
    _plan, fine, grids = _grid_ref(face_counts, face_indices, nv, verts,
                                   creases=creases, crease_w=crease_w)

    F = len(face_counts)
    face = rng.integers(0, F, n)
    # stay a bit inside cells so the grid bilinear reference is accurate
    u = rng.uniform(0.02, 0.98, n).astype(np.float32)
    v = rng.uniform(0.02, 0.98, n).astype(np.float32)
    u = np.where(face_counts[face] == 4, u, u + rng.integers(
        0, np.maximum(face_counts[face], 1)))

    out = eval_patch_table(pt, np.asarray(verts_iso), face, u, v)
    P = np.asarray(out["P"])
    ref = _sample_grid(grids, fine, face, u, v, face_counts)
    scale = max(1.0, float(np.abs(verts).max()))
    err = np.abs(P - ref).max(axis=1)
    assert np.quantile(err, 0.99) < tol * scale, \
        f"p99 err {np.quantile(err, 0.99)}"

    # derivative: central FD of the analytic eval itself
    h = 1e-3
    Pu1 = np.asarray(eval_patch_table(pt, np.asarray(verts_iso), face,
                                      u + h, v)["P"])
    Pu0 = np.asarray(eval_patch_table(pt, np.asarray(verts_iso), face,
                                      u - h, v)["P"])
    fd = (Pu1 - Pu0) / (2 * h)
    du = np.asarray(out["dPdu"])
    # mask out points whose FD stencil straddles a patch-cell boundary
    ok = np.abs(fd - du).max(axis=1) < 0.05 * (np.abs(du).max(axis=1) + 1.0)
    assert ok.mean() > 0.99, f"dPdu FD agreement only {ok.mean()}"
    return pt


def test_regular_grid(rng):
    """Flat 5x5 quad grid: interior patches are pure B-spline."""
    n = 6
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    verts = np.stack([xs.ravel(), ys.ravel(),
                      np.sin(xs.ravel() * 0.7) * np.cos(ys.ravel())],
                     1).astype(np.float32)
    quads = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            quads.append([a, a + n, a + n + 1, a + 1])
    quads = np.asarray(quads)
    fc = np.full(len(quads), 4)
    pt = _check_cage(fc, quads.reshape(-1), n * n, verts, rng)
    # interior iso quads must be closed-form regular (no ladders there)
    assert (pt.kind == 0).sum() > 0


def test_cube_evs(rng):
    """Cube: all 8 corners are valence-3 EVs -> ladder path."""
    verts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float32)
    quads = np.array([[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
                      [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]])
    fc = np.full(6, 4)
    pt = _check_cage(fc, quads.reshape(-1), 8, verts, rng, tol=2e-3)
    assert len(pt.ladders) > 0


def test_creased_cube(rng):
    """Cube with 4 infinitely sharp edges (a creased band)."""
    verts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float32)
    quads = np.array([[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
                      [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]])
    creases = np.array([[0, 1], [1, 3], [3, 2], [2, 0]])
    cw = np.full(4, np.inf, np.float32)
    _check_cage(np.full(6, 4), quads.reshape(-1), 8, verts, rng,
                tol=2e-3, creases=creases, crease_w=cw)


def test_semisharp_crease(rng):
    """Finite crease weight decays; iso level rises to absorb it."""
    verts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float32)
    quads = np.array([[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
                      [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]])
    creases = np.array([[0, 1]])
    cw = np.asarray([1.6], np.float32)
    pt = _check_cage(np.full(6, 4), quads.reshape(-1), 8, verts, rng,
                     tol=2.5e-3, creases=creases, crease_w=cw)
    assert pt.iso_levels >= 4


def test_ngon_face(rng):
    """A pentagon cap: n-gon sub-patch convention u in [0, n)."""
    ang = np.linspace(0, 2 * np.pi, 5, endpoint=False)
    ring = np.stack([np.cos(ang), np.sin(ang), np.zeros(5)], 1)
    outer = 2.2 * ring + np.array([0, 0, 0.4])
    verts = np.concatenate([ring, outer]).astype(np.float32)
    faces = [[0, 1, 2, 3, 4]]
    counts = [5]
    for i in range(5):
        j = (i + 1) % 5
        faces.append([i, 5 + i, 5 + j, j])
        counts.append(4)
    fi = np.concatenate([np.asarray(f) for f in faces])
    _check_cage(np.asarray(counts), fi, 10, verts, rng, tol=3e-3, n=300)


def test_limit_corner_stencil(rng):
    """verify.cpp:1772 recipe: at a regular interior corner the eval
    equals the (1,4,1)^2/36 B-spline limit stencil of the cage."""
    n = 7
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    z = rng.normal(size=n * n).astype(np.float32) * 0.3
    verts = np.stack([xs.ravel(), ys.ravel(), z], 1).astype(np.float32)
    quads = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            quads.append([a, a + n, a + n + 1, a + 1])
    quads = np.asarray(quads)
    pt = build_patch_table(np.full(len(quads), 4), quads.reshape(-1),
                           n * n)
    verts_iso = evaluate_plan(pt.plan, verts)
    # face with corner at interior vertex (i,j) = (3,3): face index?
    fidx = 2 * (n - 1) + 2   # face whose corner0 = vertex (2? ,...)
    out = eval_patch_table(pt, np.asarray(verts_iso),
                           np.asarray([fidx]), np.asarray([0.0]),
                           np.asarray([0.0]))
    vid = quads[fidx][0]
    i0, j0 = vid // n, vid % n
    st = np.array([[1, 4, 1], [4, 16, 4], [1, 4, 1]], np.float32) / 36.0
    ref = np.zeros(3, np.float32)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            ref += st[di + 1, dj + 1] * verts[(i0 + di) * n + (j0 + dj)]
    np.testing.assert_allclose(np.asarray(out["P"])[0], ref, atol=1e-4)


def test_scene_interpolate_derivatives(rng):
    """Scene.interpolate(derivatives=True) returns the analytic set and
    agrees with the grid-based interpolate on a creased cube."""
    import embree_tpu as et
    verts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float32)
    quads = np.array([[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
                      [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]])
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.set_levels(5, 2)
    mesh = et.SubdivMesh(verts, np.full(6, 4), quads.reshape(-1),
                         edge_creases=np.array([[0, 1], [1, 3]]),
                         edge_crease_weights=np.array([np.inf, np.inf],
                                                      np.float32))
    gid = scene.attach(mesh)
    scene.commit()
    face = np.array([0, 1, 2, 3, 4, 5])
    u = np.full(6, 0.37, np.float32)
    v = np.full(6, 0.61, np.float32)
    out = scene.interpolate(gid, face, u, v, derivatives=True)
    assert set(out) >= {"P", "dPdu", "dPdv", "ddPdudu", "ddPdvdv",
                        "ddPdudv", "Ng"}
    P_grid, _N = scene.interpolate(gid, face, u, v)
    np.testing.assert_allclose(np.asarray(out["P"]), np.asarray(P_grid),
                               atol=8e-3)
    # derivatives nonzero and finite
    assert np.isfinite(np.asarray(out["dPdu"])).all()
    assert np.abs(np.asarray(out["dPdu"])).max() > 0.1


# --------------------------------------------------------------------------
# round 4: exact EV evaluation (self-similar cap) gates
# --------------------------------------------------------------------------

def _cube():
    verts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float32)
    faces = np.array([[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
                      [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]], np.int64)
    return verts, np.full(6, 4, np.int64), faces.reshape(-1)


def test_ev_exact_vs_deep_regular():
    """The ladder+exact-cap eval must agree with the REGULAR B-spline
    path of a deeper iso table to f32 everywhere near the EV (the two
    paths share no code beyond the bases, so agreement means both hit
    the true limit surface). Pre-r4 this disagreed by ~1.4e-3 (bf16
    matmul precision in the eval einsums) — VERDICT r3 weak #7."""
    verts, fc, fi = _cube()
    pt2 = build_patch_table(fc, fi, 8)
    pt6 = build_patch_table(fc, fi, 8, iso_levels=6)
    vi2 = evaluate_plan(pt2.plan, verts)
    vi6 = evaluate_plan(pt6.plan, verts)
    assert pt2.lad_stam_ok is not None and pt2.lad_stam_ok.all()

    rng = np.random.default_rng(5)
    n = 500
    r = 10 ** rng.uniform(-1.5, -0.7, n)
    th = rng.uniform(0.1, np.pi / 2 - 0.1, n)
    u = (r * np.cos(th)).astype(np.float32)
    v = (r * np.sin(th)).astype(np.float32)
    f = np.zeros(n, np.int32)
    o2 = eval_patch_table(pt2, np.asarray(vi2), f, u, v)
    o6 = eval_patch_table(pt6, np.asarray(vi6), f, u, v)
    dP = np.linalg.norm(np.asarray(o2["P"]) - np.asarray(o6["P"]), axis=1)
    assert dP.max() < 1e-5, dP.max()
    dD = np.linalg.norm(np.asarray(o2["dPdu"]) - np.asarray(o6["dPdu"]),
                        axis=1)
    assert dD.max() < 1e-3, dD.max()


def test_ev_adjacent_fd_gate():
    """VERDICT r4 #5 done-gate: EV-adjacent dPdu matches central FD at
    >= 99% (tol 1e-3 relative), with the FD step scaled to the distance
    from the EV (h = r/20; a fixed step is invalid once it spans the EV,
    where curvature is unbounded)."""
    verts, fc, fi = _cube()
    pt = build_patch_table(fc, fi, 8)
    vi = np.asarray(evaluate_plan(pt.plan, verts))
    rng = np.random.default_rng(7)
    n = 800
    r = 10 ** rng.uniform(-2.2, -1.0, n)
    th = rng.uniform(0.05, np.pi / 2 - 0.05, n)
    u = r * np.cos(th)
    v = r * np.sin(th)
    f = np.zeros(n, np.int32)
    h = r / 20
    out = eval_patch_table(pt, vi, f, u.astype(np.float32),
                           v.astype(np.float32))
    Pp = np.asarray(eval_patch_table(pt, vi, f, (u + h).astype(np.float32),
                                     v.astype(np.float32))["P"], np.float64)
    Pm = np.asarray(eval_patch_table(pt, vi, f, (u - h).astype(np.float32),
                                     v.astype(np.float32))["P"], np.float64)
    fd = (Pp - Pm) / (2 * h)[:, None]
    an = np.asarray(out["dPdu"])
    rel = np.linalg.norm(fd - an, axis=1) / np.maximum(
        np.linalg.norm(fd, axis=1), 1e-9)
    assert (rel < 1e-3).mean() >= 0.99, \
        f"only {(rel < 1e-3).mean():.3f} under 1e-3 (median {np.median(rel):.2e})"
    # second derivatives: FD of dPdu
    Dp = np.asarray(eval_patch_table(pt, vi, f, (u + h).astype(np.float32),
                                     v.astype(np.float32))["dPdu"], np.float64)
    Dm = np.asarray(eval_patch_table(pt, vi, f, (u - h).astype(np.float32),
                                     v.astype(np.float32))["dPdu"], np.float64)
    fd2 = (Dp - Dm) / (2 * h)[:, None]
    an2 = np.asarray(out["ddPdudu"])
    rel2 = np.linalg.norm(fd2 - an2, axis=1) / np.maximum(
        np.linalg.norm(fd2, axis=1), 1e-6)
    assert (rel2 < 1e-2).mean() >= 0.95, \
        f"dd agreement {(rel2 < 1e-2).mean():.3f}"


def test_ev_limit_point_exact():
    """P at the EV itself equals the CC limit point (the exact cap's
    A^k power converges to the limit eigenvector)."""
    verts, fc, fi = _cube()
    pt = build_patch_table(fc, fi, 8)
    vi = np.asarray(evaluate_plan(pt.plan, verts))
    o = eval_patch_table(pt, vi, np.array([0], np.int32),
                         np.array([1e-7], np.float32),
                         np.array([1e-7], np.float32))
    P = np.asarray(o["P"])[0]
    # valence-3 cube-corner CC limit: computed by deep refinement
    plan = plan_subdivision(fc, fi, 8, levels=7)
    fine = limit_project(plan, evaluate_plan(plan, verts))
    d = np.linalg.norm(np.asarray(fine) - verts[0], axis=1)
    truth = np.asarray(fine)[np.argmin(d)]
    assert np.linalg.norm(P - truth) < 1e-4, (P, truth)


def test_creased_ev_golden():
    """Creased-EV golden (VERDICT r4 #5): a cube with one infinite
    crease ring — EVs on the crease keep the deep-ladder path; P must
    match deep refinement to 1e-3 near the creased EV and the FD gate
    must hold away from the crease curve."""
    verts, fc, fi = _cube()
    # crease the 4 edges around face 0 (vertices 0,1,3,2)
    creases = np.array([[0, 1], [1, 3], [3, 2], [2, 0]], np.int64)
    cw = np.full(4, np.inf, np.float32)
    pt = build_patch_table(fc, fi, 8, edge_creases=creases,
                           edge_crease_weights=cw)
    vi = np.asarray(evaluate_plan(pt.plan, verts))
    plan, fine, grids = _grid_ref(fc, fi, 8, verts, levels=7,
                                  creases=creases, crease_w=cw)
    rng = np.random.default_rng(11)
    n = 400
    # face 0's corners are creased valence-3 EVs: sample near corner 0
    r = 10 ** rng.uniform(-2.0, -1.0, n)
    th = rng.uniform(0.05, np.pi / 2 - 0.05, n)
    u = (r * np.cos(th)).astype(np.float32)
    v = (r * np.sin(th)).astype(np.float32)
    f = np.zeros(n, np.int32)
    out = eval_patch_table(pt, vi, f, u, v)
    ref = _sample_grid(grids, fine, f, u, v, fc)
    err = np.abs(np.asarray(out["P"]) - ref).max(axis=1)
    assert np.quantile(err, 0.99) < 1e-3, np.quantile(err, 0.99)
    # FD gate with distance-scaled step
    h = (r / 20).astype(np.float64)
    Pp = np.asarray(eval_patch_table(pt, vi, f, (u + h).astype(np.float32),
                                     v)["P"], np.float64)
    Pm = np.asarray(eval_patch_table(pt, vi, f, (u - h).astype(np.float32),
                                     v)["P"], np.float64)
    fd = (Pp - Pm) / (2 * h)[:, None]
    an = np.asarray(out["dPdu"])
    rel = np.linalg.norm(fd - an, axis=1) / np.maximum(
        np.linalg.norm(fd, axis=1), 1e-9)
    assert (rel < 1e-2).mean() >= 0.95, (rel < 1e-2).mean()


def test_creased_ev_exact_cap():
    """VERDICT r4 #7: the self-similar cap now covers CREASE-ring EVs
    (infinite crease rules are stationary). Gates: the cap activates on
    a creased cube's ladders; the creased-EV eval agrees with a
    deeper-iso table to f32-level (was the ~1e-3 bilinear cap); and
    the FD gate holds for ON-CREASE approach directions."""
    verts, fc, fi = _cube()
    creases = np.array([[0, 1], [1, 3], [3, 2], [2, 0]], np.int64)
    cw = np.full(4, np.inf, np.float32)
    pt2 = build_patch_table(fc, fi, 8, edge_creases=creases,
                            edge_crease_weights=cw)
    pt6 = build_patch_table(fc, fi, 8, edge_creases=creases,
                            edge_crease_weights=cw, iso_levels=6)
    # the exact cap must activate for the creased ladders now
    assert pt2.lad_stam_ok is not None and pt2.lad_stam_ok.any()
    frac = float(np.asarray(pt2.lad_stam_ok).mean())
    assert frac > 0.9, f"cap active on only {frac:.0%} of ladders"

    vi2 = np.asarray(evaluate_plan(pt2.plan, verts))
    vi6 = np.asarray(evaluate_plan(pt6.plan, verts))
    rng = np.random.default_rng(17)
    n = 500
    r = 10 ** rng.uniform(-1.5, -0.7, n)
    # INCLUDES on-crease approach (th=0, walking along the crease
    # curve); capped at pi/3 so the u-direction FD step below never
    # crosses u=0 into the neighboring sub-patch
    th = rng.uniform(0.0, np.pi / 3, n)
    u = (r * np.cos(th)).astype(np.float32)
    v = (r * np.sin(th)).astype(np.float32)
    f = np.zeros(n, np.int32)
    o2 = eval_patch_table(pt2, vi2, f, u, v)
    o6 = eval_patch_table(pt6, vi6, f, u, v)
    dP = np.linalg.norm(np.asarray(o2["P"]) - np.asarray(o6["P"]), axis=1)
    assert dP.max() < 2e-5, dP.max()     # was ~1e-3 with the bilinear cap
    dD = np.linalg.norm(np.asarray(o2["dPdu"]) - np.asarray(o6["dPdu"]),
                        axis=1)
    assert dD.max() < 1e-3, dD.max()

    # FD gate with ON-CREASE approach: walk along u at v ~ 0 (the
    # crease curve) and at a handful of angled directions
    h = (r / 20).astype(np.float64)
    Pp = np.asarray(eval_patch_table(pt2, vi2, f,
                                     (u + h).astype(np.float32), v)["P"],
                    np.float64)
    Pm = np.asarray(eval_patch_table(pt2, vi2, f,
                                     (u - h).astype(np.float32), v)["P"],
                    np.float64)
    fd = (Pp - Pm) / (2 * h)[:, None]
    an = np.asarray(o2["dPdu"])
    rel = np.linalg.norm(fd - an, axis=1) / np.maximum(
        np.linalg.norm(fd, axis=1), 1e-9)
    assert (rel < 1e-2).mean() >= 0.99, (rel < 1e-2).mean()
