"""Corona loader (corona_loader.cpp analog)."""
import os
import textwrap

import numpy as np
import pytest


@pytest.fixture()
def corona_scene(tmp_path):
    (tmp_path / "tri.obj").write_text(textwrap.dedent("""\
        v 0 0 0
        v 1 0 0
        v 0 1 0
        f 1 2 3
        """))
    (tmp_path / "mats.mtl.xml").write_text(textwrap.dedent("""\
        <mtlLib>
          <materialDefinition name="red">
            <material class="Native">
              <diffuse>1 0 0</diffuse>
            </material>
          </materialDefinition>
          <materialDefinition name="chrome">
            <material class="Native">
              <reflect><color>0.9 0.9 0.9</color></reflect>
            </material>
          </materialDefinition>
        </mtlLib>
        """))
    (tmp_path / "scene.scn").write_text(textwrap.dedent("""\
        <scene>
          <conffile>render.conf</conffile>
          <mtllib>mats.mtl.xml</mtllib>
          <camera>ignored</camera>
          <environment>ignored</environment>
          <geometryGroup>
            <instance>
              <material class="Reference">red</material>
              <transform>1 0 0 0  0 1 0 0  0 0 1 0</transform>
              <transform>1 0 0 5  0 1 0 0  0 0 1 0</transform>
            </instance>
            <object class="file">tri.obj</object>
          </geometryGroup>
          <geometryGroup>
            <instance>
              <material class="Reference">chrome</material>
              <transform>2 0 0 0  0 2 0 0  0 0 2 1</transform>
            </instance>
            <object class="file">tri.obj</object>
          </geometryGroup>
        </scene>
        """))
    return str(tmp_path / "scene.scn")


def test_corona_load(corona_scene):
    from embree_tpu.render.coronaloader import load_corona
    from embree_tpu.render.materials import MAT_MIRROR
    sc = load_corona(corona_scene)
    assert len(sc.geometries) == 3  # 2 instances of group 1 + 1 of group 2
    g0, m0 = sc.geometries[0]
    g1, m1 = sc.geometries[1]
    g2, m2 = sc.geometries[2]
    np.testing.assert_allclose(np.asarray(g1.vertices)[0], [5, 0, 0],
                               atol=1e-6)  # translated instance
    np.testing.assert_allclose(np.asarray(g2.vertices)[1], [2, 0, 1],
                               atol=1e-6)  # scaled+translated
    assert sc.materials[m0]["kd"] == (1.0, 0.0, 0.0)
    assert sc.materials[m2]["type"] == MAT_MIRROR


def test_corona_through_viewer(corona_scene):
    from embree_tpu.render.camera import Camera
    from embree_tpu.render.tutorials import viewer
    st = viewer.build_scene(corona_scene)
    img, _ = viewer.render_frame(st, Camera(from_=(2, 1, -5), to=(2, 0.3, 0)),
                                 (64, 48))
    img = np.asarray(img)
    assert img.max() > 0.1 and np.isfinite(img).all()


def test_corona_through_convert(corona_scene, tmp_path):
    from embree_tpu.render.tutorials.convert import main
    from embree_tpu.render.xmlloader import load_xml
    out = str(tmp_path / "out.xml")
    assert main(["-i", corona_scene, "-o", out]) == 0
    assert len(load_xml(out).geometries) == 3
