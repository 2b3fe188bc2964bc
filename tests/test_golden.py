"""Golden-image regression gates (the reference has only eyeball -o
renders, tutorial.cpp:702; SURVEY §4.8 asks for proper allclose gates)."""
import os

import numpy as np

from embree_tpu.render.camera import Camera
from embree_tpu.render.image import read_pfm

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_triangle_geometry_golden():
    from embree_tpu.render.tutorials import triangle_geometry as tg
    state = tg.build_scene()
    cam = Camera(from_=(1.5, 1.5, -1.5), to=(0, 0, 0))
    img, _ = tg.render_frame(state, cam, (64, 64))
    ref = read_pfm(os.path.join(GOLDEN, "triangle_geometry_64.pfm"))
    np.testing.assert_allclose(np.asarray(img), ref, atol=1e-5)


def test_displacement_golden():
    from embree_tpu.render.tutorials import displacement_geometry as dg
    state = dg.build_scene(None, 4, 2)
    cam = Camera(from_=(2.5, 2.5, 2.5), to=(0, 0, 0))
    img, _ = dg.render_frame(state, cam, (48, 48))
    ref = read_pfm(os.path.join(GOLDEN, "displacement_48.pfm"))
    # tiny per-pixel tolerance; a handful of edge pixels may flip
    diff = np.abs(np.asarray(img) - ref).max(-1)
    assert (diff > 0.02).mean() < 0.01
