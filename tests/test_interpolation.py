"""Vertex-attribute interpolation (interpolation_device.cpp analog;
InterpolateTest taxonomy verify.cpp:1772-2117)."""
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.render.tutorials.interpolation import (CUBE_COLORS, CUBE_Q,
                                                       CUBE_T, CUBE_V,
                                                       build_scene,
                                                       render_frame)


def test_triangle_interpolate_analytic():
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    g = et.TriangleMesh(CUBE_V, CUBE_T)
    g.vertex_attributes.append(CUBE_COLORS)
    gid = s.attach(g)
    s.commit()
    prim = np.array([0, 3], np.int64)
    u = np.array([0.25, 0.5], np.float32)
    v = np.array([0.25, 0.25], np.float32)
    got = np.asarray(s.interpolate(gid, prim, u, v, slot=0))
    for k in range(2):
        i0, i1, i2 = CUBE_T[prim[k]]
        want = ((1 - u[k] - v[k]) * CUBE_COLORS[i0]
                + u[k] * CUBE_COLORS[i1] + v[k] * CUBE_COLORS[i2])
        np.testing.assert_allclose(got[k], want, atol=1e-6)


def test_triangle_interpolate_positions_match_surface():
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    gid = s.attach(et.TriangleMesh(CUBE_V, CUBE_T))
    s.commit()
    P, N = s.interpolate(gid, np.array([0], np.int64),
                         np.array([0.3], np.float32),
                         np.array([0.4], np.float32))
    P = np.asarray(P)[0]
    i0, i1, i2 = CUBE_T[0]
    want = (0.3 * CUBE_V[i1] + 0.4 * CUBE_V[i2]
            + (1 - 0.7) * CUBE_V[i0])
    np.testing.assert_allclose(P, want, atol=1e-6)
    assert abs(np.linalg.norm(np.asarray(N)[0]) - 1.0) < 1e-5


def test_quad_interpolate_bilinear_corners():
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    g = et.QuadMesh(CUBE_V, CUBE_Q)
    g.vertex_attributes.append(CUBE_COLORS)
    gid = s.attach(g)
    s.commit()
    # uv corners hit the quad's four vertices
    prim = np.zeros(4, np.int64)
    u = np.array([0, 1, 1, 0], np.float32)
    v = np.array([0, 0, 1, 1], np.float32)
    got = np.asarray(s.interpolate(gid, prim, u, v, slot=0))
    want = CUBE_COLORS[CUBE_Q[0]]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_subdiv_attribute_is_smoothed_average_at_center():
    dev = et.Device(
        "ignore_config_files=1,subdiv_accel=bvh4.compressed.grid")
    s = et.Scene(dev)
    s.set_levels(3, 2)
    g = et.SubdivMesh(CUBE_V, np.full(6, 4, np.int32), CUBE_Q.reshape(-1))
    g.vertex_attributes.append(CUBE_COLORS)
    gid = s.attach(g)
    s.commit()
    c = np.asarray(s.interpolate(gid, np.array([0], np.int64),
                                 np.array([0.5], np.float32),
                                 np.array([0.5], np.float32), slot=0))[0]
    # face-0 corner colors pull the smoothed center toward their mean,
    # mixed with the other ring vertices — value strictly inside hull
    corners = CUBE_COLORS[CUBE_Q[0]]
    assert np.all(c >= CUBE_COLORS.min(0) - 1e-6)
    assert np.all(c <= CUBE_COLORS.max(0) + 1e-6)
    assert np.linalg.norm(c - corners.mean(0)) < 0.35


def test_interpolation_demo_renders():
    st = build_scene()
    from embree_tpu.render.camera import Camera
    img, _ = render_frame(st, Camera(from_=(0, 3, -6.5), to=(0, 0, 0)),
                          (96, 64))
    img = np.asarray(img)
    assert img.max() > 0.2
    assert np.isfinite(img).all()
