"""Watertight matrix — the reference's WatertightTest groups
(verify.cpp:2635-2712, registered :4367-4416: watertight_triangles /
_quads / _subdiv / _mb) at the reference's statistical strength:
>= 100k random inside-origin rays against closed surfaces, miss rate
<= 0.002%. Covers every subdiv accel mode including the paper's
production `compressed.leaf` (bomberman mode) and the full-precision
reference flavor, plus triangle/subdiv motion blur, and a t-accuracy
bound for the pizza-box leaf approximation."""
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.verify.fixtures import quad_sphere, subdiv_cube, \
    triangle_sphere

MISS_GATE = 2e-5  # verify.cpp:2707-2709 (0.002%)
N_RAYS = 100_000  # reference uses 50-500-res scenes x many rays


def _inside_rays(rng, n):
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return et.make_rays(np.zeros((n, 3), np.float32), d), d


@pytest.fixture()
def rng():
    return np.random.default_rng(0x3A7)


def test_watertight_triangles(rng):
    verts, idx = triangle_sphere((0, 0, 0), 2.0, 60)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(verts, idx))
    s.commit()
    rays, _ = _inside_rays(rng, N_RAYS)
    miss = 1.0 - np.asarray(s.intersect(rays).valid).mean()
    assert miss <= MISS_GATE, f"tri miss rate {miss:.2e}"


def test_watertight_quads(rng):
    verts, quads = quad_sphere((0, 0, 0), 2.0, 50)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.QuadMesh(verts, quads))
    s.commit()
    rays, _ = _inside_rays(rng, N_RAYS)
    miss = 1.0 - np.asarray(s.intersect(rays).valid).mean()
    assert miss <= MISS_GATE, f"quad miss rate {miss:.2e}"


@pytest.mark.parametrize("accel", [None,
                                   "bvh4.compressed.grid",
                                   "bvh4.compressed.box",
                                   "bvh4.compressed.leaf",
                                   "bvh4.compressed.full"])
def test_watertight_subdiv(rng, accel):
    """All subdiv accel modes, including the paper/bomberman production
    mode (compressed.leaf) and the full-precision reference flavor."""
    cfg = "ignore_config_files=1"
    if accel:
        cfg += f",subdiv_accel={accel}"
    dev = et.Device(cfg)
    s = et.Scene(dev)
    v, counts, fidx = subdiv_cube()
    s.attach(et.SubdivMesh(v, counts, fidx))
    s.set_levels(4, 2)
    s.commit()
    rays, _ = _inside_rays(rng, N_RAYS)
    miss = 1.0 - np.asarray(s.intersect(rays).valid).mean()
    assert miss <= MISS_GATE, f"subdiv({accel}) miss rate {miss:.2e}"


def test_compressed_leaf_t_accuracy(rng):
    """Pizza-box leaf mode t error vs the eager tessellated surface:
    the 4-bit quantized z-heights bound the surface within the shared
    extent inflation (compressed_leaf.h:198-251, MAX_EXTENT=1.0), so
    hit distances stay within a small fraction of the cell size."""
    n = 20_000
    rays, _ = _inside_rays(rng, n)

    def hits_for(accel):
        dev = et.Device(f"ignore_config_files=1,subdiv_accel={accel}")
        s = et.Scene(dev)
        v, counts, fidx = subdiv_cube()
        s.attach(et.SubdivMesh(v, counts, fidx))
        s.set_levels(4, 2)
        s.commit()
        h = s.intersect(rays)
        return np.asarray(h.valid), np.asarray(h.t)

    lv, lt = hits_for("bvh4.compressed.leaf")
    fv, ft = hits_for("bvh4.compressed.full")
    both = lv & fv
    assert both.mean() > 0.999
    # cell size at subdLvl 4 on the unit-ish cube ~ 2/16; the pizza-box
    # approximation must stay well inside one cell of the true surface
    err = np.abs(lt[both] - ft[both])
    assert np.quantile(err, 0.99) < 0.06, \
        f"p99 t err {np.quantile(err, 0.99):.3f}"
    assert err.max() < 0.25, f"max t err {err.max():.3f}"


def test_watertight_motion_blur(rng):
    verts, idx = triangle_sphere((0, 0, 0), 2.0, 40)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMeshMB(verts, verts + np.float32([0.3, 0, 0]),
                               idx))
    s.commit()
    n = N_RAYS
    rays, _ = _inside_rays(rng, n)
    time = rng.uniform(0, 1, n).astype(np.float32)
    miss = 1.0 - np.asarray(s.intersect(rays, time=time).valid).mean()
    assert miss <= MISS_GATE, f"mb miss rate {miss:.2e}"


def test_watertight_subdiv_motion_blur(rng):
    """Subdiv MB (the reference's watertight _mb groups include subdiv,
    verify.cpp:4367-4416): two subdivided timesteps of a closed cage,
    sampled at random ray times."""
    v, counts, fidx = subdiv_cube()
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.SubdivMeshMB(v, np.asarray(v) * 1.15, counts, fidx))
    s.set_levels(3, 2)
    s.commit()
    n = 50_000
    rays, _ = _inside_rays(rng, n)
    time = rng.uniform(0, 1, n).astype(np.float32)
    miss = 1.0 - np.asarray(s.intersect(rays, time=time).valid).mean()
    assert miss <= MISS_GATE, f"subdiv mb miss rate {miss:.2e}"
