"""Subdivision/displacement tutorial end-to-end renders."""
import numpy as np
import pytest

from embree_tpu.render.camera import Camera
from embree_tpu.render.noise import fbm_displacement, noise3
from embree_tpu.render.tutorials import displacement_geometry as dg
from embree_tpu.render.tutorials import subdivision_geometry as sg


def test_noise_properties():
    rng = np.random.default_rng(1)
    p = rng.uniform(-4, 4, (1000, 3)).astype(np.float32)
    n = noise3(p)
    assert np.isfinite(n).all()
    assert np.abs(n).max() < 2.0
    assert n.std() > 0.05  # actually varies
    d = fbm_displacement(p)
    assert (d >= 0).all() and d.max() < 3.0


@pytest.mark.parametrize("mode", [None, "bvh4.compressed.leaf",
                                  "bvh4.compressed.grid"])
def test_displacement_render(mode):
    state = dg.build_scene(mode, 4, 2)
    cam = Camera(from_=(2.5, 2.5, 2.5), to=(0, 0, 0))
    img, _ = dg.render_frame(state, cam, (48, 48))
    img = np.asarray(img)
    assert np.isfinite(img).all()
    frac = (img.sum(-1) > 0).mean()
    assert 0.3 < frac < 0.95
    # salmon cube pixels present (r > g > b)
    salmon = (img[..., 0] > img[..., 1]) & (img[..., 1] > img[..., 2]) \
        & (img[..., 0] > 0.3)
    assert salmon.mean() > 0.02


def test_displacement_modes_similar():
    """leaf-mode image close to the eager-tessellation image (the paper's
    approximation-quality claim, image-space gate)."""
    cam = Camera(from_=(2.5, 2.5, 2.5), to=(0, 0, 0))
    img_ref, _ = dg.render_frame(dg.build_scene(None, 4, 2), cam, (48, 48))
    img_leaf, _ = dg.render_frame(
        dg.build_scene("bvh4.compressed.leaf", 4, 2), cam, (48, 48))
    img_grid, _ = dg.render_frame(
        dg.build_scene("bvh4.compressed.grid", 4, 2), cam, (48, 48))
    ref, leaf, grid = map(np.asarray, (img_ref, img_leaf, img_grid))
    # grid mode nearly identical except shading normals on compressed hits
    diff_pix = (np.abs(grid - ref).max(-1) > 0.15).mean()
    assert diff_pix < 0.25, f"grid image differs on {diff_pix:.1%} pixels"
    diff_pix_leaf = (np.abs(leaf - ref).max(-1) > 0.25).mean()
    assert diff_pix_leaf < 0.35


def test_subdivision_render():
    state = sg.build_scene(None, 3, 2, crease_weight=np.inf)
    cam = Camera(from_=(2.5, 2.5, 2.5), to=(0, 0, 0))
    img, _ = dg.render_frame(state, cam, (48, 48))
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert (img.sum(-1) > 0).mean() > 0.3
