"""End-to-end triangle_geometry tutorial render checks (golden-behavior
gate for the first milestone; SURVEY.md §7 minimum slice)."""
import numpy as np

from embree_tpu.render.camera import Camera
from embree_tpu.render.tutorials import triangle_geometry as tg


def _render(w=64, h=64):
    state = tg.build_scene()
    cam = Camera(from_=(1.5, 1.5, -1.5), to=(0, 0, 0))
    img, _ = tg.render_frame(state, cam, (w, h))
    return np.asarray(img)


def test_renders_cube_and_plane():
    img = _render()
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    # background pixels are black, some pixels are lit
    frac_nonblack = (img.sum(-1) > 0).mean()
    assert 0.2 < frac_nonblack < 0.95
    # cube face colors present: red-ish and green-ish faces from this view
    assert img[..., 0].max() > 0.4


def test_shadow_present():
    """The cube must cast a shadow on the ground plane: some plane pixels
    receive only the 0.5*diffuse ambient term."""
    img = _render(128, 128)
    px = img.reshape(-1, 3)
    # reference-exact: the plane shades face_colors[primID] -> RED
    # (triangle_geometry_device.cpp:152); ambient-only = (0.5,0,0),
    # lit = (1.077,0,0)
    plane_like = (px[:, 1] < 1e-3) & (px[:, 2] < 1e-3) & (px[:, 0] > 0.1)
    vals = px[plane_like][:, 0]
    assert (np.abs(vals - 0.5) < 1e-2).any(), "no shadowed plane pixels"
    assert (vals > 0.55).any(), "no lit plane pixels"


def test_deterministic():
    a = _render(32, 32)
    b = _render(32, 32)
    np.testing.assert_array_equal(a, b)
