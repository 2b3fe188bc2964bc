"""Intersection-filter callback tests (filter.h / FilterTest analog,
verify.cpp:2414)."""
import jax.numpy as jnp
import numpy as np

import embree_tpu as et


def test_filter_rejects_and_traversal_continues():
    # two parallel triangles; filter rejects the nearer one
    v = np.array([[-1, -1, 2], [1, -1, 2], [0, 1, 2],
                  [-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(v, idx))
    s.commit()

    rays = et.make_rays(np.array([[0, 0, 5]], np.float32),
                        np.array([[0, 0, -1]], np.float32))
    h = s.intersect(rays)
    assert int(h.prim_id[0]) == 0 and abs(float(h.t[0]) - 3.0) < 1e-5

    # reject prim 0 -> traversal must deliver prim 1 behind it
    s.set_intersection_filter(
        lambda org, d, t, u, v_, ng, geom, prim: prim != 0)
    h = s.intersect(rays)
    assert int(h.prim_id[0]) == 1 and abs(float(h.t[0]) - 5.0) < 1e-5

    # reject everything -> miss
    s.set_intersection_filter(
        lambda org, d, t, u, v_, ng, geom, prim: jnp.zeros_like(t, bool))
    assert not bool(s.intersect(rays).valid[0])

    # clearing restores the fast path
    s.set_intersection_filter(None)
    assert int(s.intersect(rays).prim_id[0]) == 0


def test_filter_by_uv_transparency():
    """Classic transparency-texture filter: reject hits with u > 0.5."""
    v = np.array([[-1, -1, 0], [3, -1, 0], [-1, 3, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(v, idx))
    s.commit()
    s.set_intersection_filter(
        lambda org, d, t, u, v_, ng, geom, prim: u <= 0.5)

    org = np.array([[0, 0, 5], [1.8, -0.5, 5]], np.float32)
    d = np.array([[0, 0, -1]] * 2, np.float32)
    h = s.intersect(et.make_rays(org, d))
    assert bool(h.valid[0])       # u ~ 0.25
    assert not bool(h.valid[1])   # u ~ 0.7 rejected
