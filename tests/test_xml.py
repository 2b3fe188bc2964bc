"""Embree .xml scene format loader/writer
(tutorials/common/scenegraph/xml_loader.cpp / xml_writer.cpp analog)."""
import os

import numpy as np
import pytest

from embree_tpu.render.xmlloader import load_xml, write_xml
from embree_tpu.scene.geometry import QuadMesh, SubdivMesh, TriangleMesh

XML = """<?xml version="1.0"?>
<scene>
  <PerspectiveCamera from="0,0,-3" to="0,0,0" up="0,1,0" fov="45"/>
  <PointLight>
    <AffineSpace translate="1 2 3"/>
    <I>10 10 10</I>
  </PointLight>
  <AmbientLight><L>0.1 0.1 0.1</L></AmbientLight>
  <Transform>
    <AffineSpace translate="0 0 2"/>
    <TriangleMesh>
      <material id="red">
        <code>"Matte"</code>
        <parameters><float3 name="reflectance">1 0 0</float3></parameters>
      </material>
      <positions>-1 -1 0  1 -1 0  0 1 0</positions>
      <triangles>0 1 2</triangles>
    </TriangleMesh>
  </Transform>
  <QuadMesh>
    <material><code>"OBJ"</code>
      <parameters><float3 name="Kd">0 1 0</float3></parameters></material>
    <positions>0 0 5  1 0 5  1 1 5  0 1 5</positions>
    <indices>0 1 2 3</indices>
  </QuadMesh>
  <SubdivisionMesh>
    <material id="red"><code>"Matte"</code><parameters/></material>
    <positions>0 0 0  1 0 0  1 1 0  0 1 0</positions>
    <faces>4</faces>
    <position_indices>0 1 2 3</position_indices>
    <edge_creases>0 1</edge_creases>
    <edge_crease_weights>2.5</edge_crease_weights>
  </SubdivisionMesh>
</scene>
"""


@pytest.fixture
def xml_path(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(XML)
    return str(p)


def test_load(xml_path):
    sc = load_xml(xml_path)
    assert [type(g).__name__ for g, _ in sc.geometries] == \
        ["TriangleMesh", "QuadMesh", "SubdivMesh"]
    # Transform baked into vertices
    tm = sc.geometries[0][0]
    assert np.allclose(np.asarray(tm.vertices)[:, 2], 2.0)
    # material id "red" shared between tri mesh and subdiv mesh
    assert sc.geometries[0][1] == sc.geometries[2][1]
    assert sc.materials[sc.geometries[0][1]]["kd"] == (1.0, 0.0, 0.0)
    assert sc.camera["fov"] == 45.0
    assert {l["type"] for l in sc.lights} == {"point", "ambient"}
    assert sc.lights[0]["position"] == (1.0, 2.0, 3.0)


def test_round_trip(xml_path, tmp_path):
    sc = load_xml(xml_path)
    p2 = str(tmp_path / "rt.xml")
    write_xml(p2, sc)
    sc2 = load_xml(p2)
    assert len(sc2.geometries) == len(sc.geometries)
    for (g1, _), (g2, _) in zip(sc.geometries, sc2.geometries):
        assert type(g1) is type(g2)
        assert np.allclose(np.asarray(g1.vertices), np.asarray(g2.vertices))
    sub = sc2.geometries[2][0]
    assert float(np.asarray(sub.edge_crease_weights)[0]) == 2.5


def test_viewer_renders_xml(xml_path):
    from embree_tpu.render.camera import Camera
    from embree_tpu.render.tutorials import viewer

    state = viewer.build_scene(xml_path)
    cam = Camera(from_=(0, 0, -3), to=(0, 0, 0))
    img, _ = viewer.render_frame(state, cam, (32, 32))
    img = np.asarray(img)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # the red triangle at z=2 fills the view center
    assert img[16, 16, 0] > 0.1 and img[16, 16, 1] == 0.0


def test_ply_loader(tmp_path):
    """PLY loader (tutorials/common/scenegraph/ply_loader.cpp analog):
    ascii + binary_little_endian, fan triangulation of n-gon faces."""
    import struct

    from embree_tpu.render.plyloader import load_ply

    p = tmp_path / "a.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 2\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n3 0 1 2\n4 0 1 2 3\n")
    m = load_ply(str(p))
    assert m.vertices.shape == (4, 3)
    assert m.indices.shape == (3, 3)  # tri + fan-split quad

    p2 = tmp_path / "b.ply"
    with open(p2, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n"
                b"element vertex 3\nproperty float x\nproperty float y\n"
                b"property float z\nproperty uchar red\n"
                b"element face 1\nproperty list uchar int vertex_indices\n"
                b"end_header\n")
        for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
            f.write(struct.pack("<fffB", *v, 255))
        f.write(struct.pack("<Biii", 3, 0, 1, 2))
    m2 = load_ply(str(p2))
    assert np.allclose(np.asarray(m2.vertices)[1], (1, 0, 0))
    assert m2.indices.shape == (1, 3)
