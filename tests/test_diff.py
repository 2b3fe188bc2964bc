"""Differentiable-hit gradient validation (SURVEY §7 hard part 3):
jax.grad through the stop-gradient traversal + analytic re-evaluation
must match central finite differences of the rendered quantity."""
import jax
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from embree_tpu.diff.hit import reeval_hit
from embree_tpu.scene.scene import scene_intersect


def _scene(verts):
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(verts, idx))
    return s.commit(), idx


def test_vertex_grad_matches_finite_difference():
    verts0 = np.array([[-1, -1, 2.0], [1, -1, 2.2], [1, 1, 2.4],
                       [-1, 1, 2.1]], np.float32)
    cs, idx = _scene(verts0)

    rng = np.random.default_rng(7)
    n = 64
    d = np.concatenate([rng.uniform(-0.3, 0.3, (n, 2)),
                        np.ones((n, 1))], 1).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(np.zeros((n, 3), np.float32), d)

    def loss(vparam):
        tris = cs.tris._replace(v0=vparam[idx[:, 0]],
                                v1=vparam[idx[:, 1]],
                                v2=vparam[idx[:, 2]])
        sel = jax.lax.stop_gradient(scene_intersect(cs, rays, isa="xla"))
        h = reeval_hit(tris, rays, sel.gprim, sel.valid)
        return jnp.sum(jnp.where(h.valid, h.t, 0.0))

    g = np.asarray(jax.grad(loss)(jnp.asarray(verts0)))
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    # central differences on every vertex coordinate. The hit SELECTION
    # is frozen (stop_gradient), so compare against differences of the
    # same frozen-selection loss — which is what the gradient represents.
    eps = 1e-3
    for vi in range(4):
        for k in range(3):
            vp = verts0.copy(); vp[vi, k] += eps
            vm = verts0.copy(); vm[vi, k] -= eps
            fd = (float(loss(jnp.asarray(vp))) -
                  float(loss(jnp.asarray(vm)))) / (2 * eps)
            np.testing.assert_allclose(g[vi, k], fd, rtol=2e-2, atol=2e-3)


def test_grad_zero_for_missing_rays():
    verts0 = np.array([[-1, -1, 2.0], [1, -1, 2.0], [1, 1, 2.0],
                       [-1, 1, 2.0]], np.float32)
    cs, idx = _scene(verts0)
    # rays pointing away: no hits, gradient must be exactly zero
    rays = et.make_rays(np.zeros((8, 3), np.float32),
                        np.tile(np.float32([0, 0, -1]), (8, 1)))

    def loss(vparam):
        tris = cs.tris._replace(v0=vparam[idx[:, 0]],
                                v1=vparam[idx[:, 1]],
                                v2=vparam[idx[:, 2]])
        sel = jax.lax.stop_gradient(scene_intersect(cs, rays, isa="xla"))
        h = reeval_hit(tris, rays, sel.gprim, sel.valid)
        return jnp.sum(jnp.where(h.valid, h.t, 0.0))

    g = np.asarray(jax.grad(loss)(jnp.asarray(verts0)))
    assert np.all(g == 0.0)


def test_hit_t_grad_fused_matches_reeval(rng):
    """bench.py's fused t-gradient (diff/hit.py hit_t_grad: kernel-t
    primal + analytic dt/dcorner VJP) must match the autodiff
    re-evaluation gradient and central finite differences."""
    import jax
    import jax.numpy as jnp

    from embree_tpu.diff.hit import hit_t_grad, reeval_hit_verts
    from embree_tpu.scene.scene import scene_intersect
    from embree_tpu.verify.fixtures import triangle_sphere

    verts, idx = triangle_sphere((0, 0, 0), 1.5, 10)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(verts, idx))
    cs = s.commit()
    n = 300
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    rays = et.make_rays(org, d)
    idxd = jnp.asarray(np.asarray(idx))
    sel = scene_intersect(cs, rays, isa="xla")

    def loss_re(v):
        t, _u, _v = reeval_hit_verts(v, idxd, rays, sel.gprim, sel.valid)
        return jnp.sum(jnp.where(sel.valid, t, 0.0))

    def loss_fu(v):
        t = hit_t_grad(v, idxd, rays, sel.gprim, sel.valid, sel.t)
        return jnp.sum(jnp.where(sel.valid, t, 0.0))

    def loss_fu_packed(v):
        # packed-table corner source (the bench.py form)
        t = hit_t_grad(v, idxd, rays, sel.gprim, sel.valid, sel.t,
                       tris=cs.tris)
        return jnp.sum(jnp.where(sel.valid, t, 0.0))

    vp = jnp.asarray(verts)
    ga = np.asarray(jax.grad(loss_re)(vp))
    gb = np.asarray(jax.grad(loss_fu)(vp))
    scale = np.abs(ga).max()
    np.testing.assert_allclose(gb, ga, rtol=1e-3, atol=2e-4 * scale)
    gc = np.asarray(jax.grad(loss_fu_packed)(vp))
    np.testing.assert_allclose(gc, ga, rtol=1e-3, atol=2e-4 * scale)
    # spot FD on the 3 largest-gradient coordinates
    flat = np.abs(ga).ravel()
    for j in np.argsort(flat)[-3:]:
        vi, ax = divmod(int(j), 3)
        h = 1e-3
        e = np.zeros_like(np.asarray(verts))
        e[vi, ax] = h
        fd = (float(loss_re(jnp.asarray(verts + e)))
              - float(loss_re(jnp.asarray(verts - e)))) / (2 * h)
        np.testing.assert_allclose(gb[vi, ax], fd, rtol=5e-2,
                                   atol=1e-3 * scale)
