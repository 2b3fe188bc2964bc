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
