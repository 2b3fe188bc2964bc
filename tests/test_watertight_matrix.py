"""Watertight matrix: quads, subdiv (compressed + eager), motion blur —
the rest of the reference's WatertightTest groups (verify.cpp:4367-4416:
watertight_triangles/_quads/_subdiv/_mb; triangles covered in
test_intersect.py)."""
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.verify.fixtures import quad_sphere, subdiv_cube, \
    triangle_sphere

MISS_GATE = 2e-5  # verify.cpp:2707-2709 (0.002%)


def _inside_rays(rng, n):
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return et.make_rays(np.zeros((n, 3), np.float32), d), d


@pytest.fixture()
def rng():
    return np.random.default_rng(0x3A7)


def test_watertight_quads(rng):
    verts, quads = quad_sphere((0, 0, 0), 2.0, 50)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.QuadMesh(verts, quads))
    s.commit()
    rays, _ = _inside_rays(rng, 30_000)
    miss = 1.0 - np.asarray(s.intersect(rays).valid).mean()
    assert miss <= MISS_GATE, f"quad miss rate {miss:.2e}"


@pytest.mark.parametrize("accel", [None, "bvh4.compressed.grid",
                                   "bvh4.compressed.box"])
def test_watertight_subdiv(rng, accel):
    cfg = "ignore_config_files=1"
    if accel:
        cfg += f",subdiv_accel={accel}"
    dev = et.Device(cfg)
    s = et.Scene(dev)
    v, counts, fidx = subdiv_cube()
    s.attach(et.SubdivMesh(v, counts, fidx))
    s.set_levels(4, 2)
    s.commit()
    rays, _ = _inside_rays(rng, 20_000)
    miss = 1.0 - np.asarray(s.intersect(rays).valid).mean()
    assert miss <= MISS_GATE, f"subdiv({accel}) miss rate {miss:.2e}"


def test_watertight_motion_blur(rng):
    verts, idx = triangle_sphere((0, 0, 0), 2.0, 40)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMeshMB(verts, verts + np.float32([0.3, 0, 0]),
                               idx))
    s.commit()
    n = 8000
    rays, _ = _inside_rays(rng, n)
    time = rng.uniform(0, 1, n).astype(np.float32)
    miss = 1.0 - np.asarray(s.intersect(rays, time=time).valid).mean()
    assert miss <= MISS_GATE, f"mb miss rate {miss:.2e}"
