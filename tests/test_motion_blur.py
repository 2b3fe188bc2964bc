"""Motion-blur tests (MB builders/intersectors, verify MB matrix analog)."""
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xB10)


def _sphere(res):
    from embree_tpu.verify.fixtures import triangle_sphere
    return triangle_sphere((0, 0, 0), 2.0, res)


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


def test_multisegment_four_timesteps(rng):
    """N=4 timesteps with NON-linear (piecewise) motion: hits at segment
    interior times match a static scene built at the exact interpolated
    positions (bvh_builder_msmblur.h multi-segment semantics)."""
    import embree_tpu as et
    verts, idx = _sphere(12)
    # zig-zag motion: t=0 -> +x, t=1/3 -> +y, t=2/3 -> -x, t=1 -> done
    offs = [np.zeros(3), np.float32([0.5, 0, 0]),
            np.float32([0.5, 0.7, 0]), np.float32([-0.2, 0.7, 0.3])]
    ts = [verts + o.astype(np.float32) for o in offs]
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMeshMB(indices=idx, timesteps=ts))
    s.commit()

    n = 4000
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = np.zeros((n, 3), np.float32)
    rays = et.make_rays(org, d)

    for tq in (0.0, 0.18, 1.0 / 3.0, 0.5, 0.83, 1.0):
        h = s.intersect(rays, time=np.full(n, tq, np.float32))
        # static reference at the interpolated cage
        x = tq * 3
        a = int(min(np.floor(x), 2))
        w = np.float32(x - a)
        vref = (1 - w) * ts[a] + w * ts[a + 1]
        dev2 = et.Device("ignore_config_files=1")
        s2 = et.Scene(dev2)
        s2.attach(et.TriangleMesh(vref, idx))
        s2.commit()
        href = s2.intersect(rays)
        np.testing.assert_array_equal(np.asarray(h.valid),
                                      np.asarray(href.valid))
        m = np.asarray(href.valid)
        np.testing.assert_allclose(np.asarray(h.t)[m],
                                   np.asarray(href.t)[m], rtol=2e-5,
                                   atol=2e-6)


def test_mb_pallas_kernel_matches_xla(rng):
    """VERDICT r2 #5: the pallas MB packet kernel (interpret mode on
    CPU; the TPU dispatch path) must reproduce the XLA MB traversal —
    per-ray times, N-timestep segment lerp leaves, conservative
    time-range node unions."""
    import embree_tpu as et
    from embree_tpu.scene.geometry import TriangleMeshMB

    # grid of triangles swinging through 3 timesteps (kinked motion)
    base, idx = _sphere(12)
    base = np.asarray(base, np.float32)
    t0 = base
    t1 = base + np.array([0.8, 0.3, 0.0], np.float32)
    t2 = base + np.array([1.6, -0.4, 0.0], np.float32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(TriangleMeshMB(indices=idx, timesteps=[t0, t1, t2]))
    cs = s.commit()

    n = 2048
    org = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    org[:, 2] = 3.0
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = -1.0
    rays = et.make_rays(org, d)
    times = rng.uniform(0, 1, n).astype(np.float32)

    ref = et.scene_intersect(cs, rays, isa="xla", time=times)
    got = et.scene_intersect(cs, rays, isa="pallas", time=times)
    # belt-and-braces: drive the kernel directly too (interpret mode)
    from embree_tpu.traverse.pallas_mb import intersect_mb_pallas
    assert cs.mb_pallas is not None
    direct = intersect_mb_pallas(cs.mb_pallas, cs.mb, rays, times,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(direct.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    m = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.t)[m],
                               np.asarray(ref.t)[m], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.prim_id)[m],
                                  np.asarray(ref.prim_id)[m])
