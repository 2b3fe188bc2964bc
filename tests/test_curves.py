"""Curve/line-segment geometry tests (bezier1v/line_intersector analogs)."""
import numpy as np

import embree_tpu as et


def test_line_segments_round(rng):
    # one thick segment along x at y=z=0, radius 0.2
    verts = np.array([[0, 0, 0, 0.2], [2, 0, 0, 0.2]], np.float32)
    idx = np.array([0], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    gid = s.attach(et.LineSegments(verts, idx))
    s.commit()

    org = np.array([[1, 0, 5], [1, 0.19, 5], [1, 0.5, 5], [-1, 0, 5]],
                   np.float32)
    d = np.array([[0, 0, -1]] * 4, np.float32)
    h = s.intersect(et.make_rays(org, d))
    v = np.asarray(h.valid)
    assert v[0] and v[1] and not v[2] and not v[3]
    np.testing.assert_allclose(float(h.t[0]), 4.8, atol=1e-3)
    assert int(h.geom_id[0]) == gid
    # u runs along the segment
    np.testing.assert_allclose(float(h.u[0]), 0.5, atol=0.02)


def test_line_segment_caps(rng):
    verts = np.array([[0, 0, 0, 0.3], [1, 0, 0, 0.3]], np.float32)
    idx = np.array([0], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.LineSegments(verts, idx))
    s.commit()
    # ray along the axis hits the start cap
    h = s.intersect(et.make_rays(np.array([[-2, 0, 0]], np.float32),
                                 np.array([[1, 0, 0]], np.float32)))
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 1.7, atol=1e-3)


def test_bezier_hair(rng):
    # gently curved hair strand with tapering radius
    cp = np.array([
        [0, 0, 0, 0.10],
        [1, 0.5, 0, 0.08],
        [2, -0.5, 0, 0.06],
        [3, 0, 0, 0.04]], np.float32)
    idx = np.array([0], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    gid = s.attach(et.BezierCurves(cp, idx, tessellation_rate=16))
    s.commit()

    # rays shooting down along the curve's xy path should hit
    n = 32
    ts = np.linspace(0.05, 0.95, n).astype(np.float32)
    b = ((1 - ts[:, None]) ** 3 * cp[0] + 3 * (1 - ts[:, None]) ** 2
         * ts[:, None] * cp[1] + 3 * (1 - ts[:, None]) * ts[:, None] ** 2
         * cp[2] + ts[:, None] ** 3 * cp[3])
    org = np.stack([b[:, 0], b[:, 1], np.full(n, 5.0)], 1).astype(np.float32)
    d = np.tile(np.array([0, 0, -1.0], np.float32), (n, 1))
    h = s.intersect(et.make_rays(org, d))
    assert np.asarray(h.valid).mean() > 0.95
    v = np.asarray(h.valid)
    assert (np.asarray(h.geom_id)[v] == gid).all()
    assert (np.asarray(h.prim_id)[v] == 0).all()
    # u approximately recovers the curve parameter
    err = np.abs(np.asarray(h.u)[v] - ts[v])
    assert np.median(err) < 0.08
    # hit distance ~ 5 - radius(t)
    r = (1 - ts) ** 3 * 0.10 + 3 * (1 - ts) ** 2 * ts * 0.08 \
        + 3 * (1 - ts) * ts ** 2 * 0.06 + ts ** 3 * 0.04
    np.testing.assert_allclose(np.asarray(h.t)[v], (5 - r)[v], atol=0.03)
