"""rtcore-shim API round trip (include/embree3 call shapes)."""
import numpy as np

import embree_tpu.rtcore as rtc
from embree_tpu.core.rayhit import make_rays


def test_rtcore_triangle_roundtrip():
    device = rtc.rtcNewDevice("ignore_config_files=1")
    scene = rtc.rtcNewScene(device)

    geom = rtc.rtcNewGeometry(device, rtc.RTC_GEOMETRY_TYPE_TRIANGLE)
    verts = np.array([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2]], np.uint32)
    rtc.rtcSetSharedGeometryBuffer(geom, rtc.RTC_BUFFER_TYPE_VERTEX, 0, verts)
    rtc.rtcSetSharedGeometryBuffer(geom, rtc.RTC_BUFFER_TYPE_INDEX, 0, tris)
    rtc.rtcCommitGeometry(geom)
    gid = rtc.rtcAttachGeometry(scene, geom)
    rtc.rtcReleaseGeometry(geom)
    rtc.rtcCommitScene(scene)

    rays = make_rays(np.array([[0, 0, 5]], np.float32),
                     np.array([[0, 0, -1]], np.float32))
    h = rtc.rtcIntersect1(scene, rays)
    assert bool(h.valid[0]) and int(h.geom_id[0]) == gid
    assert bool(rtc.rtcOccluded1(scene, rays)[0])
    lo, hi = rtc.rtcGetSceneBounds(scene)
    assert (lo <= -1 + 1e-6).any() and (hi >= 1 - 1e-6).any()


def test_rtcore_subdiv_with_levels():
    device = rtc.rtcNewDevice(
        "ignore_config_files=1,subdiv_accel=bvh4.compressed.leaf")
    scene = rtc.rtcNewScene(device)
    geom = rtc.rtcNewGeometry(device, rtc.RTC_GEOMETRY_TYPE_SUBDIVISION)
    verts = np.array([
        [-1, -1, -1], [1, -1, -1], [1, -1, 1], [-1, -1, 1],
        [-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]], np.float32)
    indices = np.array([0, 4, 5, 1, 1, 5, 6, 2, 2, 6, 7, 3,
                        0, 3, 7, 4, 4, 7, 6, 5, 0, 1, 2, 3], np.uint32)
    faces = np.full(6, 4, np.uint32)
    rtc.rtcSetSharedGeometryBuffer(geom, rtc.RTC_BUFFER_TYPE_VERTEX, 0, verts)
    rtc.rtcSetSharedGeometryBuffer(geom, rtc.RTC_BUFFER_TYPE_INDEX, 0, indices)
    rtc.rtcSetSharedGeometryBuffer(geom, rtc.RTC_BUFFER_TYPE_FACE, 0, faces)
    rtc.rtcCommitGeometry(geom)
    rtc.rtcAttachGeometry(scene, geom)
    rtc.rtcSetSceneLevels(scene, 3, 2)
    rtc.rtcCommitScene(scene)
    assert scene.committed.compressed is not None

    rays = make_rays(np.array([[3, 0.1, 0.1]], np.float32),
                     np.array([[-1, 0, 0]], np.float32))
    h = rtc.rtcIntersect1(scene, rays)
    assert bool(h.valid[0])
    P, N = rtc.rtcInterpolate1(scene, 0, h.prim_id, h.u, h.v)
    assert np.isfinite(np.asarray(P)).all()
