"""curve_geometry + lazy_geometry demo behavior."""
import numpy as np

import embree_tpu as et
from embree_tpu.render.camera import Camera


def test_bspline_segments_convex_hull():
    from embree_tpu.render.tutorials.curve_geometry import (HAIR_INDICES,
                                                            HAIR_VERTICES)
    g = et.BSplineCurves(HAIR_VERTICES, HAIR_INDICES, tessellation_rate=8)
    p0, p1, prim, u0, du = g.to_segments()
    # B-spline points stay inside the control-point hull
    lo = HAIR_VERTICES[:, :3].min(0) - 1e-5
    hi = HAIR_VERTICES[:, :3].max(0) + 1e-5
    for p in (p0, p1):
        assert (p[:, :3] >= lo).all() and (p[:, :3] <= hi).all()
    assert prim.shape[0] == 6 * 8
    # closed loop: first point of curve 0 == last point of curve 5
    np.testing.assert_allclose(p0[0], p1[-1], atol=1e-5)


def test_bspline_curve_hit():
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    # straight bspline along y at x=z=0, radius 0.3
    cp = np.asarray([[0, -3, 0, 0.3], [0, -1, 0, 0.3],
                     [0, 1, 0, 0.3], [0, 3, 0, 0.3]], np.float32)
    s.attach(et.BSplineCurves(cp, np.zeros(1, np.int32)))
    s.commit()
    org = np.asarray([[0, 0, -5]], np.float32)
    d = np.asarray([[0, 0, 1]], np.float32)
    h = s.intersect(et.make_rays(org, d))
    assert bool(h.valid[0])
    assert abs(float(h.t[0]) - 4.7) < 0.05  # hits cylinder at z=-0.3


def test_curve_demo_renders():
    from embree_tpu.render.tutorials.curve_geometry import (build_scene,
                                                            render_frame)
    st = build_scene()
    img, _ = render_frame(st, Camera(from_=(2, 2.5, -6), to=(0, 0, 0)),
                          (96, 64))
    img = np.asarray(img)
    assert img.max() > 0.3 and np.isfinite(img).all()


def test_lazy_geometry_builds_only_touched():
    from embree_tpu.render.tutorials import lazy_geometry as lg
    st = lg.build_scene()
    assert st["built"] == 0  # nothing tessellated before any ray
    # zoomed-in camera seeing only the center sphere region
    cam = Camera(from_=(0, 0.4, -2.2), to=(0, 0, 0), fov=30)
    img, _ = lg.render_frame(st, cam, (64, 48))
    assert 0 < st["built"] < st["centers"].shape[0]
    assert np.asarray(img).max() > 0.1
