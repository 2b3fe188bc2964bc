"""Motion-blur tests (MB builders/intersectors, verify MB matrix analog)."""
import numpy as np

import embree_tpu as et


def test_mb_triangle_interpolates():
    # triangle sweeping from x=0 to x=4 over the shutter
    v0 = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    v1 = v0 + np.array([4, 0, 0], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMeshMB(v0, v1, idx))
    s.commit()

    org = np.array([[0, 0, 5], [2, 0, 5], [4, 0, 5]], np.float32)
    d = np.array([[0, 0, -1]] * 3, np.float32)
    rays = et.make_rays(org, d)

    h0 = s.intersect(rays, time=0.0)
    hh = s.intersect(rays, time=0.5)
    h1 = s.intersect(rays, time=1.0)
    assert list(np.asarray(h0.valid)) == [True, False, False]
    assert list(np.asarray(hh.valid)) == [False, True, False]
    assert list(np.asarray(h1.valid)) == [False, False, True]
    np.testing.assert_allclose(float(hh.t[1]), 5.0, atol=1e-4)


def test_mb_per_ray_time():
    v0 = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    v1 = v0 + np.array([4, 0, 0], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMeshMB(v0, v1, idx))
    s.commit()
    org = np.array([[0, 0, 5], [4, 0, 5]], np.float32)
    d = np.array([[0, 0, -1]] * 2, np.float32)
    h = s.intersect(et.make_rays(org, d), time=np.array([0.0, 1.0], np.float32))
    assert list(np.asarray(h.valid)) == [True, True]


def test_mb_combined_with_static():
    v0 = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    vmb0 = v0 + np.array([0, 0, 2], np.float32)
    vmb1 = v0 + np.array([0, 0, 3], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(v0, idx))                 # static at z=0
    s.attach(et.TriangleMeshMB(vmb0, vmb1, idx))       # moving z=2..3
    s.commit()
    rays = et.make_rays(np.array([[0, 0, 5]], np.float32),
                        np.array([[0, 0, -1]], np.float32))
    h = s.intersect(rays, time=0.0)
    np.testing.assert_allclose(float(h.t[0]), 3.0, atol=1e-4)  # MB closer
    assert int(h.geom_id[0]) == 1
    h = s.intersect(rays, time=1.0)
    np.testing.assert_allclose(float(h.t[0]), 2.0, atol=1e-4)
