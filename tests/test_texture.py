"""Texture sampling tests (texture2d analog)."""
import numpy as np

from embree_tpu.render.texture import make_texture_set, sample_texture


def test_nearest_and_bilinear():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = (1, 0, 0)   # will be at v=1 (top row)
    img[1, 1] = (0, 0, 1)
    ts = make_texture_set([img])
    tid = np.zeros(4, np.int32)
    u = np.array([0.25, 0.75, 0.25, 0.75], np.float32)
    v = np.array([0.75, 0.25, 0.25, 0.75], np.float32)
    c = np.asarray(sample_texture(ts, tid, u, v, bilinear=False))
    np.testing.assert_allclose(c[0], (1, 0, 0))   # top-left texel
    np.testing.assert_allclose(c[1], (0, 0, 1))   # bottom-right texel
    np.testing.assert_allclose(c[2], (0, 0, 0))
    # bilinear at center mixes
    cb = np.asarray(sample_texture(ts, tid[:1],
                                   np.array([0.5], np.float32),
                                   np.array([0.5], np.float32)))
    np.testing.assert_allclose(cb[0], (0.25, 0, 0.25), atol=1e-6)


def test_multiple_textures_padded():
    a = np.full((1, 1, 3), 0.5, np.float32)
    b = np.zeros((4, 8, 3), np.float32)
    b[:, :4] = (1, 1, 0)
    ts = make_texture_set([a, b])
    assert ts.data.shape == (2, 4, 8, 3)
    tid = np.array([0, 1, 1], np.int32)
    u = np.array([0.3, 0.1, 0.9], np.float32)
    v = np.array([0.3, 0.5, 0.5], np.float32)
    c = np.asarray(sample_texture(ts, tid, u, v, bilinear=False))
    np.testing.assert_allclose(c[0], (0.5, 0.5, 0.5))
    np.testing.assert_allclose(c[1], (1, 1, 0))
    np.testing.assert_allclose(c[2], (0, 0, 0))
