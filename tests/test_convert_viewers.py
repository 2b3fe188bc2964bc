"""convert tool + viewer_stream/viewer_anim demos."""
import os
import textwrap

import numpy as np
import pytest

from embree_tpu.render.camera import Camera

CUBE_OBJ = textwrap.dedent("""\
    v -1 -1 -1
    v 1 -1 -1
    v 1 1 -1
    v -1 1 -1
    v -1 -1 1
    v 1 -1 1
    v 1 1 1
    v -1 1 1
    f 1 2 3 4
    f 5 8 7 6
    f 1 5 6 2
    f 2 6 7 3
    f 3 7 8 4
    f 5 1 4 8
    """)


@pytest.fixture()
def cube_obj(tmp_path):
    p = tmp_path / "cube.obj"
    p.write_text(CUBE_OBJ)
    return str(p)


def test_convert_obj_to_xml_roundtrip(cube_obj, tmp_path):
    from embree_tpu.render.tutorials.convert import main
    from embree_tpu.render.xmlloader import load_xml
    out = str(tmp_path / "out.xml")
    assert main(["-i", cube_obj, "-o", out]) == 0
    sc = load_xml(out)
    g, _ = sc.geometries[0]
    assert np.asarray(g.vertices).shape == (8, 3)
    assert np.asarray(g.indices).shape == (12, 3)


def test_convert_triangles_to_quads(cube_obj, tmp_path):
    from embree_tpu.render.tutorials.convert import main
    from embree_tpu.render.xmlloader import load_xml
    out = str(tmp_path / "quads.xml")
    main(["-i", cube_obj, "-convert-triangles-to-quads", "-o", out])
    sc = load_xml(out)
    from embree_tpu.scene.geometry import QuadMesh
    assert any(isinstance(g, QuadMesh) for g, _ in sc.geometries)
    q = next(g for g, _ in sc.geometries if isinstance(g, QuadMesh))
    assert np.asarray(q.indices).shape == (6, 4)  # all 6 faces pair back


def test_convert_to_subdivs_and_cst(cube_obj, tmp_path):
    from embree_tpu.render.tutorials.convert import main
    from embree_tpu.render.xmlloader import load_xml
    out = str(tmp_path / "subd.xml")
    main(["-i", cube_obj, "-convert-to-subdivs",
          "-centerScaleTranslate", "2", "1", "0", "0", "-o", out])
    sc = load_xml(out)
    from embree_tpu.scene.geometry import SubdivMesh
    g = next(g for g, _ in sc.geometries if isinstance(g, SubdivMesh))
    v = np.asarray(g.vertices)
    # cube was centered already: scaled x2 then translated +x
    np.testing.assert_allclose(v.min(0), [-1, -2, -2], atol=1e-5)
    np.testing.assert_allclose(v.max(0), [3, 2, 2], atol=1e-5)


def test_viewer_stream_matches_viewer(cube_obj):
    from embree_tpu.render.tutorials import viewer, viewer_stream
    st = viewer.build_scene(cube_obj)
    cam = Camera(from_=(3, 3, -5), to=(0, 0, 0))
    a, _ = viewer.render_frame(st, cam, (64, 48))
    b, _ = viewer_stream.render_frame(st, cam, (64, 48))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_viewer_anim_moves(cube_obj):
    from embree_tpu.render.tutorials import viewer_anim as va
    st = va.build_scene(paths=[cube_obj])
    cam = Camera(from_=(3, 3, -5), to=(0, 0, 0))
    va._frame[0] = 0
    img0, _ = va.render_frame(st, cam, (64, 48))
    st = va.animate(st, 0.5)  # halfway between keyframes
    img1, _ = va.render_frame(st, cam, (64, 48))
    a, b = np.asarray(img0), np.asarray(img1)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 0.01  # deformation visible
