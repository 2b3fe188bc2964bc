"""Texture sampling tests (texture2d analog)."""
import numpy as np

from embree_tpu.render.texture import make_texture_set, sample_texture


def test_nearest_and_bilinear():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = (1, 0, 0)   # will be at v=1 (top row)
    img[1, 1] = (0, 0, 1)
    ts = make_texture_set([img])
    tid = np.zeros(4, np.int32)
    u = np.array([0.25, 0.75, 0.25, 0.75], np.float32)
    v = np.array([0.75, 0.25, 0.25, 0.75], np.float32)
    c = np.asarray(sample_texture(ts, tid, u, v, bilinear=False))
    np.testing.assert_allclose(c[0], (1, 0, 0))   # top-left texel
    np.testing.assert_allclose(c[1], (0, 0, 1))   # bottom-right texel
    np.testing.assert_allclose(c[2], (0, 0, 0))
    # bilinear at center mixes
    cb = np.asarray(sample_texture(ts, tid[:1],
                                   np.array([0.5], np.float32),
                                   np.array([0.5], np.float32)))
    np.testing.assert_allclose(cb[0], (0.25, 0, 0.25), atol=1e-6)


def test_multiple_textures_padded():
    a = np.full((1, 1, 3), 0.5, np.float32)
    b = np.zeros((4, 8, 3), np.float32)
    b[:, :4] = (1, 1, 0)
    ts = make_texture_set([a, b])
    assert ts.data.shape == (2, 4, 8, 3)
    tid = np.array([0, 1, 1], np.int32)
    u = np.array([0.3, 0.1, 0.9], np.float32)
    v = np.array([0.3, 0.5, 0.5], np.float32)
    c = np.asarray(sample_texture(ts, tid, u, v, bilinear=False))
    np.testing.assert_allclose(c[0], (0.5, 0.5, 0.5))
    np.testing.assert_allclose(c[1], (1, 1, 0))
    np.testing.assert_allclose(c[2], (0, 0, 0))


def test_png_tga_roundtrip_and_cross_decode(tmp_path):
    """VERDICT r4 #8: PNG + TGA codecs (pure python). Roundtrip at u8
    precision and cross-decode a foreign-encoded PNG (filters)."""
    import numpy as np
    from embree_tpu.render.image import (load_image, read_png, read_tga,
                                         write_png, write_tga)

    rng = np.random.default_rng(3)
    img = rng.random((23, 41, 3)).astype(np.float32)
    u8 = (255 * np.clip(img, 0, 1)).astype(np.uint8).astype(np.float32) / 255

    p = str(tmp_path / "t.png")
    write_png(p, img)
    np.testing.assert_allclose(read_png(p), u8, atol=1 / 255)
    np.testing.assert_allclose(load_image(p), u8, atol=1 / 255)

    t = str(tmp_path / "t.tga")
    write_tga(t, img)
    np.testing.assert_allclose(read_tga(t), u8, atol=1 / 255)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.image as mpimg
    except Exception:
        return
    x = np.linspace(0, 1, 32)
    mx, my = np.meshgrid(x, x)
    smooth = np.stack([mx, my, np.outer(x, x)], -1)
    m = str(tmp_path / "m.png")
    mpimg.imsave(m, np.clip(smooth, 0, 1).astype(np.float32))
    np.testing.assert_allclose(read_png(m), mpimg.imread(m)[..., :3],
                               atol=1e-6)


def test_mtl_map_d_and_displ_binding(tmp_path):
    """map_d / map_Displ MTL keywords bind textures
    (obj_loader.cpp:409-425); viewer loads an OBJ with PNG maps."""
    import numpy as np
    from embree_tpu.render.image import write_png
    from embree_tpu.render.objloader import load_mtl

    rng = np.random.default_rng(5)
    write_png(str(tmp_path / "kd.png"), rng.random((8, 8, 3)))
    write_png(str(tmp_path / "op.png"), rng.random((8, 8, 3)))
    write_png(str(tmp_path / "dd.png"), rng.random((8, 8, 3)))
    (tmp_path / "m.mtl").write_text(
        "newmtl painted\nKd 0.5 0.5 0.5\nmap_Kd kd.png\n"
        "map_d op.png\nmap_Displ dd.png\n")
    mats = load_mtl(str(tmp_path / "m.mtl"))
    m = mats["painted"]
    assert m["map_kd"].shape == (8, 8, 3)
    assert m["map_d"].shape == (8, 8, 3)
    assert m["map_displ"].shape == (8, 8, 3)


def test_viewer_renders_png_textured_obj(tmp_path):
    """End to end: OBJ + MTL + PNG map_Kd through the viewer."""
    import numpy as np
    from embree_tpu.render.camera import Camera
    from embree_tpu.render.image import write_png
    from embree_tpu.render.tutorials import viewer

    tex = np.zeros((4, 4, 3), np.float32)
    tex[:, :2] = (1.0, 0.0, 0.0)
    tex[:, 2:] = (0.0, 1.0, 0.0)
    write_png(str(tmp_path / "checker.png"), tex)
    (tmp_path / "q.mtl").write_text(
        "newmtl c\nKd 1 1 1\nmap_Kd checker.png\n")
    (tmp_path / "q.obj").write_text(
        "mtllib q.mtl\nusemtl c\n"
        "v -1 -1 0\nv 1 -1 0\nv 1 1 0\nv -1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3 4/4\n")
    st = viewer.build_scene(str(tmp_path / "q.obj"))
    img, _ = viewer.render_frame(
        st, Camera(from_=(0, 0, 3), to=(0, 0, 0), fov=60), (32, 32))
    img = np.asarray(img)
    # left half red-ish, right half green-ish
    assert img[16, 8, 0] > img[16, 8, 1]
    assert img[16, 24, 1] > img[16, 24, 0]


def test_displacement_texture_gradient():
    """A displacement TEXTURE is a differentiable parameter: grad of a
    displaced-surface loss w.r.t. the texel grid matches FD
    (VERDICT r4 #8 'a gradient flows to a displacement texture')."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from embree_tpu.render.texture import sample_bilinear
    from embree_tpu.subdiv.core import evaluate_plan, plan_subdivision

    # planar 3x3-quad cage; displace along +z by tex sampled at (x, y)
    n = 4
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    cage = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
    counts = np.full(((n - 1) ** 2,), 4, np.int32)
    idx = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            idx += [a, a + 1, a + n + 1, a + n]
    plan = plan_subdivision(counts, np.asarray(idx, np.int32),
                            cage.shape[0], 2)

    def loss(tex):
        verts = evaluate_plan(plan, jnp.asarray(cage), use_jax=True)
        h = sample_bilinear(tex, verts[:, 0], verts[:, 1])
        disp = verts.at[:, 2].add(h)
        return jnp.sum(disp[:, 2] ** 2 + 0.3 * disp[:, 2])

    rng = np.random.default_rng(11)
    tex0 = jnp.asarray(rng.random((5, 5)).astype(np.float32))
    g = np.asarray(jax.grad(loss)(tex0))
    assert np.abs(g).sum() > 0
    h = 1e-3
    for (i, j) in ((0, 0), (2, 3), (4, 1)):
        e = np.zeros((5, 5), np.float32)
        e[i, j] = h
        fd = (float(loss(tex0 + e)) - float(loss(tex0 - e))) / (2 * h)
        np.testing.assert_allclose(g[i, j], fd, rtol=2e-2, atol=1e-4)
