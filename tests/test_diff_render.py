"""End-to-end differentiable rendering gates (BASELINE.md: pixel grads
w.r.t. vertex positions, displacement, materials): finite-difference
validation of jax.grad through the traced commit path
(diff/render.py), plus a golden-gradient regression gate."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import embree_tpu as et
from embree_tpu.diff.render import DiffSubdivRenderer

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _cube_mesh():
    verts = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float32)
    quads = np.array([[0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
                      [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]])
    return et.SubdivMesh(verts, np.full(6, 4), quads.reshape(-1))


def _rays(rng, n=512):
    org = np.zeros((n, 3), np.float32)
    org[:, 2] = -4.0
    org[:, 0] = rng.uniform(-1.5, 1.5, n)
    org[:, 1] = rng.uniform(-1.5, 1.5, n)
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = 1.0
    return et.make_rays(org, d)


def _displacement(verts, normals, amp):
    ph = jnp.sin(3.0 * verts[:, 0]) * jnp.cos(2.0 * verts[:, 1])
    return verts + amp * ph[:, None] * normals


@pytest.fixture(scope="module")
def renderer():
    rng = np.random.default_rng(0xD1FF)
    mesh = _cube_mesh()
    r = DiffSubdivRenderer(mesh, _rays(rng), level=3,
                           displacement=_displacement, isa="xla")
    r.refresh_selection(mesh.vertices, jnp.float32(0.08))
    return r


def test_grad_displacement_fd(renderer):
    """pixel -> displacement-amplitude gradient vs finite differences."""
    cage = jnp.asarray(renderer.mesh.vertices)
    f = lambda a: renderer.loss(cage, a)
    amp0 = jnp.float32(0.08)
    g = jax.grad(f)(amp0)
    h = 1e-3
    fd = (f(amp0 + h) - f(amp0 - h)) / (2 * h)
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-4
    np.testing.assert_allclose(float(g), float(fd), rtol=2e-2)


def test_grad_material_fd(renderer):
    """pixel -> material kd gradient vs finite differences."""
    cage = jnp.asarray(renderer.mesh.vertices)
    amp = jnp.float32(0.08)
    tgt = jnp.zeros_like(renderer.render(cage, amp))

    def f(kd):
        return renderer.loss(cage, amp, kd=kd, target=tgt)

    kd0 = jnp.asarray([0.8, 0.5, 0.3], jnp.float32)
    g = np.asarray(jax.grad(f)(kd0))
    for c in range(3):
        h = 1e-3
        e = np.zeros(3, np.float32)
        e[c] = h
        fd = (float(f(kd0 + e)) - float(f(kd0 - e))) / (2 * h)
        np.testing.assert_allclose(g[c], fd, rtol=2e-2, atol=1e-6)
    assert np.abs(g).max() > 1e-5


def test_grad_cage_vertices_fd(renderer):
    """pixel -> CONTROL-CAGE vertex gradient (through refinement + limit
    + displacement) vs finite differences."""
    cage0 = jnp.asarray(renderer.mesh.vertices)
    amp = jnp.float32(0.08)
    f = lambda c: renderer.loss(c, amp)
    g = np.asarray(jax.grad(f)(cage0))
    assert np.isfinite(g).all() and np.abs(g).max() > 1e-4
    rng = np.random.default_rng(7)
    for _ in range(3):
        i = rng.integers(0, cage0.shape[0])
        c = rng.integers(0, 3)
        h = 2e-3
        dp = np.zeros_like(np.asarray(cage0))
        dp[i, c] = h
        fd = (float(f(cage0 + dp)) - float(f(cage0 - dp))) / (2 * h)
        np.testing.assert_allclose(g[i, c], fd, rtol=5e-2, atol=1e-3)


def test_golden_gradients(renderer):
    """Golden-gradient regression gate: grads of the standard loss match
    the stored values (regenerate with
    EMBREE_TPU_REGEN_GOLDEN=1 python -m pytest tests/test_diff_render.py)."""
    cage = jnp.asarray(renderer.mesh.vertices)
    amp = jnp.float32(0.08)
    kd = jnp.asarray([0.8, 0.5, 0.3], jnp.float32)
    gc, ga, gk = jax.grad(
        lambda c, a, k: renderer.loss(c, a, kd=k), argnums=(0, 1, 2))(
            cage, amp, kd)
    path = os.path.join(GOLD, "grad_subdiv_cube.npz")
    if os.environ.get("EMBREE_TPU_REGEN_GOLDEN") or not os.path.exists(path):
        np.savez(path, cage=np.asarray(gc), amp=np.asarray(ga),
                 kd=np.asarray(gk))
    ref = np.load(path)
    np.testing.assert_allclose(np.asarray(gc), ref["cage"], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga), ref["amp"], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), ref["kd"], rtol=1e-4)


def test_train_step_descends(renderer):
    """A couple of SGD steps reduce an image-matching loss."""
    from embree_tpu.diff.render import make_train_step
    cage = jnp.asarray(renderer.mesh.vertices)
    amp = jnp.float32(0.08)
    kd = jnp.asarray([0.8, 0.5, 0.3], jnp.float32)
    target = renderer.render(cage, jnp.float32(0.12),
                             kd=jnp.asarray([0.6, 0.6, 0.6]))
    step = make_train_step(renderer, target, lr=5e-3)
    params = (cage, amp, kd)
    _params, l0 = step(params)
    params = _params
    for _ in range(4):
        params, l1 = step(params)
    assert float(l1) < float(l0)
