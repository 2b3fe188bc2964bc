"""`.ecs` command-file support (tutorial.cpp -c, build/bomberman.ecs)."""
from embree_tpu.render.tutorial_app import TutorialApplication


def test_ecs_expansion(tmp_path):
    ecs = tmp_path / "demo.ecs"
    ecs.write_text("""
# demo command script
--size 128 96
--compress.leaf --subdLvl 6
--compLvl 3
""")
    app = TutorialApplication("t", lambda a: None, lambda *a: None)
    args = app.parse(["-c", str(ecs), "--fov", "80"])
    assert args.size == [128, 96]
    assert args.subdiv_mode == "bvh4.compressed.leaf"
    assert args.subdLvl == 6 and args.compLvl == 3
    assert app.camera.fov == 80


def test_ecs_reference_grammar(tmp_path):
    """The reference's .ecs files use single-dash long options and -vd
    (build/bomberman.ecs grammar); relative -i paths resolve against the
    .ecs directory."""
    (tmp_path / "model.obj").write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    ecs = tmp_path / "demo.ecs"
    ecs.write_text("""
-i model.obj
-vp 1 2 3
-vd -1 -2 -3
-vu 0 1 0
-fov 90
-size 1280 768
-rtcore shader=default
--compress.leaf
--subdLvl 6
--compLvl 3
""")
    app = TutorialApplication("t", lambda a: None, lambda *a: None)
    p = app.make_parser()
    p.add_argument("-i", "--input", type=str)
    app.make_parser = lambda: p
    args = app.parse(["-c", str(ecs)])
    assert args.size == [1280, 768]
    assert args.input == str(tmp_path / "model.obj")
    assert app.camera.from_ == (1.0, 2.0, 3.0)
    assert app.camera.to == (0.0, 0.0, 0.0)  # from + vd
    assert args.subdiv_mode == "bvh4.compressed.leaf"
    assert args.subdLvl == 6 and args.compLvl == 3
