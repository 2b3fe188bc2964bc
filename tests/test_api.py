"""API/behavior tests following the reference verify suite taxonomy
(tutorials/verify/verify.cpp: device creation :628, empty scenes :943,
enable/disable :1509, dynamic update :1567, new/delete churn :1389,
user geomID :1455, garbage robustness :1649, memory monitor :3490,
progress-monitor cancellation scene.cpp:871)."""
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.verify.fixtures import random_triangles


def _ray():
    return et.make_rays(np.array([[0, 0, 5]], np.float32),
                        np.array([[0, 0, -1]], np.float32))


def _tri_at_origin():
    verts = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    return et.TriangleMesh(verts, np.array([[0, 1, 2]], np.int32))


def test_device_config_parsing():
    dev = et.Device("ignore_config_files=1,verbose=0,threads=4,isa=xla,"
                    "tessellation_cache_size=64M")
    assert dev.state.threads == 4
    assert dev.state.isa == "xla"
    assert dev.state.tessellation_cache_size == 64 * 1024 * 1024
    # unknown keys recorded, not fatal (state.cpp tolerant parse)
    dev2 = et.Device("ignore_config_files=1,bogus_key=3")
    assert dev2.state.unknown.get("bogus_key") == "3"


def test_device_error_model():
    dev = et.Device("ignore_config_files=1")
    calls = []
    dev.set_error_function(lambda code, msg: calls.append((code, msg)))
    s = et.Scene(dev)
    with pytest.raises(et.RaytracerError):
        s.intersect(_ray())  # not committed -> INVALID_OPERATION
    assert dev.get_error() == et.Error.INVALID_OPERATION
    assert dev.get_error() == et.Error.NONE  # sticky error cleared
    assert calls and calls[0][0] == et.Error.INVALID_OPERATION


def test_empty_scene():
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.commit()
    h = s.intersect(_ray())
    assert not bool(h.valid[0])
    assert not bool(s.occluded(_ray())[0])


def test_enable_disable():
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    g = _tri_at_origin()
    s.attach(g)
    s.commit()
    assert bool(s.intersect(_ray()).valid[0])
    g.disable()
    s.commit()
    assert not bool(s.intersect(_ray()).valid[0])
    g.enable()
    s.commit()
    assert bool(s.intersect(_ray()).valid[0])


def test_attach_detach_churn(rng):
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    ids = []
    for k in range(5):
        verts, idx = random_triangles(rng, 10)
        ids.append(s.attach(et.TriangleMesh(verts, idx)))
    assert ids == list(range(5))
    s.detach(2)
    s.detach(4)
    with pytest.raises(et.RaytracerError):
        s.detach(4)
    nid = s.attach(_tri_at_origin())
    assert nid == 5
    s.commit()
    h = s.intersect(_ray())
    assert int(h.geom_id[0]) in (0, 1, 3, 5)


def test_attach_by_id():
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach_by_id(_tri_at_origin(), 7)
    with pytest.raises(et.RaytracerError):
        s.attach_by_id(_tri_at_origin(), 7)
    s.commit()
    assert int(s.intersect(_ray()).geom_id[0]) == 7


def test_dynamic_vertex_update():
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    g = _tri_at_origin()
    s.attach(g)
    s.commit()
    t0 = float(s.intersect(_ray()).t[0])
    g.vertices = g.vertices - np.array([0, 0, 2], np.float32)
    s.commit()
    t1 = float(s.intersect(_ray()).t[0])
    np.testing.assert_allclose(t0, 5.0, atol=1e-5)
    np.testing.assert_allclose(t1, 7.0, atol=1e-5)


def test_progress_monitor_cancellation():
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(_tri_at_origin())
    s.progress_monitor = lambda f: f < 0.5  # cancel midway
    with pytest.raises(et.RaytracerError) as e:
        s.commit()
    assert e.value.code == et.Error.CANCELLED
    assert s.committed is None  # rolled back (scene.cpp:849-856)


def test_garbage_geometry_robustness(rng):
    """GarbageGeometryTest analog (verify.cpp:1649): NaN/degenerate
    geometry must not crash build or traversal."""
    verts, idx = random_triangles(rng, 50)
    verts[::7] = np.nan
    verts[1::9] = np.inf
    dev = et.Device("ignore_config_files=1,builder=python")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(verts, idx))
    s.commit()
    h = s.intersect(_ray())  # must not raise / poison
    assert h.t.shape == (1,)


def test_print_statistics(capsys):
    dev = et.Device("ignore_config_files=1,verbose=2")
    s = et.Scene(dev)
    s.attach(_tri_at_origin())
    s.commit()
    out = capsys.readouterr().out
    assert "BVH" in out and "triangles" in out


def test_config_file_layer(tmp_path, monkeypatch):
    (tmp_path / ".embree_tpu").write_text("verbose=0\nthreads=9\n")
    monkeypatch.chdir(tmp_path)
    dev = et.Device()
    assert dev.state.threads == 9
    # explicit string wins over config file
    dev2 = et.Device("threads=3")
    assert dev2.state.threads == 3
