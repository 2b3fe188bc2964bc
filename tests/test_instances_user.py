"""Instance + user geometry tests (scene_instance / object_intersector
analogs; verify.cpp instancing taxonomy)."""
import jax.numpy as jnp
import numpy as np

import embree_tpu as et
from embree_tpu.verify.fixtures import triangle_sphere


def _sphere_scene(dev):
    verts, idx = triangle_sphere((0, 0, 0), 1.0, 16)
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(verts, idx))
    s.commit()
    return s


def test_instances_transform_and_ids(rng):
    dev = et.Device("ignore_config_files=1")
    child = _sphere_scene(dev)

    top = et.Scene(dev)
    x1 = np.array([[1, 0, 0, 3], [0, 1, 0, 0], [0, 0, 1, 0]], np.float32)
    x2 = np.array([[2, 0, 0, -4], [0, 2, 0, 0], [0, 0, 2, 0]], np.float32)
    i1 = top.attach(et.Instance(child, x1))
    i2 = top.attach(et.Instance(child, x2))
    top.commit()

    org = np.array([[3, 0, 5], [-4, 0, 9], [0, 5, 0]], np.float32)
    d = np.array([[0, 0, -1], [0, 0, -1], [0, -1, 0]], np.float32)
    h = top.intersect(et.make_rays(org, d))
    v = np.asarray(h.valid)
    assert v[0] and v[1] and not v[2]
    np.testing.assert_allclose(float(h.t[0]), 4.0, atol=1e-3)   # unit sphere at x=3
    np.testing.assert_allclose(float(h.t[1]), 7.0, atol=1e-3)   # radius-2 at x=-4
    assert int(h.inst_id[0]) == i1 and int(h.inst_id[1]) == i2

    occ = np.asarray(top.occluded(et.make_rays(org, d)))
    np.testing.assert_array_equal(occ, v)


def test_nested_instances(rng):
    dev = et.Device("ignore_config_files=1")
    child = _sphere_scene(dev)
    mid = et.Scene(dev)
    mid.attach(et.Instance(child, np.array(
        [[1, 0, 0, 0], [0, 1, 0, 2], [0, 0, 1, 0]], np.float32)))
    mid.commit()
    top = et.Scene(dev)
    top.attach(et.Instance(mid, np.array(
        [[1, 0, 0, 5], [0, 1, 0, 0], [0, 0, 1, 0]], np.float32)))
    top.commit()
    # sphere ends up at (5, 2, 0)
    h = top.intersect(et.make_rays(np.array([[5, 2, 4]], np.float32),
                                   np.array([[0, 0, -1]], np.float32)))
    assert bool(h.valid[0])
    np.testing.assert_allclose(float(h.t[0]), 3.0, atol=1e-3)


def test_user_geometry_spheres(rng):
    """Analytic-sphere user geometry (the user_geometry tutorial demo)."""
    centers = np.array([[0, 0, 0], [3, 0, 0], [0, 3, 0]], np.float32)
    radii = np.array([1.0, 0.5, 0.25], np.float32)

    def bounds_fn(ids):
        c = centers[ids]
        r = radii[ids][:, None]
        return c - r, c + r

    cj = jnp.asarray(centers)
    rj = jnp.asarray(radii)

    def intersect_fn(p, rays, tfar):
        oc = rays.org - cj[p]
        b = jnp.sum(oc * rays.dir, -1)
        cc = jnp.sum(oc * oc, -1) - rj[p] ** 2
        a = jnp.sum(rays.dir * rays.dir, -1)
        disc = b * b - a * cc
        ok = disc >= 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = (-b - sq) / jnp.maximum(a, 1e-20)
        t1 = (-b + sq) / jnp.maximum(a, 1e-20)
        th = jnp.where(t0 > rays.tnear, t0, t1)
        ok = ok & (th > rays.tnear) & (th < tfar)
        pt = rays.org + th[..., None] * rays.dir
        ng = pt - cj[p]
        return ok, th, jnp.zeros_like(th), jnp.zeros_like(th), ng

    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    gid = s.attach(et.UserGeometry(3, bounds_fn, intersect_fn))
    s.commit()

    org = np.array([[0, 0, 5], [3, 0, 5], [0, 3, 5], [5, 5, 5]], np.float32)
    d = np.array([[0, 0, -1]] * 4, np.float32)
    h = s.intersect(et.make_rays(org, d))
    v = np.asarray(h.valid)
    assert v[0] and v[1] and v[2] and not v[3]
    np.testing.assert_allclose(float(h.t[0]), 4.0, atol=1e-4)
    np.testing.assert_allclose(float(h.t[1]), 4.5, atol=1e-4)
    np.testing.assert_allclose(float(h.t[2]), 4.75, atol=1e-4)
    assert (np.asarray(h.geom_id)[v] == gid).all()
    assert list(np.asarray(h.prim_id)[:3]) == [0, 1, 2]

    occ = np.asarray(s.occluded(et.make_rays(org, d)))
    np.testing.assert_array_equal(occ, v)


def test_user_geometry_mixed_with_triangles(rng):
    centers = np.array([[0, 0, 2]], np.float32)
    radii = np.array([0.5], np.float32)
    cj, rj = jnp.asarray(centers), jnp.asarray(radii)

    def bounds_fn(ids):
        return centers[ids] - radii[ids][:, None], centers[ids] + radii[ids][:, None]

    def intersect_fn(p, rays, tfar):
        oc = rays.org - cj[p]
        b = jnp.sum(oc * rays.dir, -1)
        cc = jnp.sum(oc * oc, -1) - rj[p] ** 2
        disc = b * b - cc
        ok = disc >= 0
        th = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        ok = ok & (th > rays.tnear) & (th < tfar)
        ng = rays.org + th[..., None] * rays.dir - cj[p]
        return ok, th, th * 0, th * 0, ng

    verts = np.array([[-2, -2, 0], [2, -2, 0], [0, 2, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    dev = et.Device("ignore_config_files=1")
    s = et.Scene(dev)
    s.attach(et.TriangleMesh(verts, idx))
    s.attach(et.UserGeometry(1, bounds_fn, intersect_fn))
    s.commit()

    org = np.array([[0, 0, 5]], np.float32)
    d = np.array([[0, 0, -1]], np.float32)
    h = s.intersect(et.make_rays(org, d))
    # the user sphere (front at z=2.5) occludes the triangle at z=0
    np.testing.assert_allclose(float(h.t[0]), 2.5, atol=1e-4)


def test_open_merge_top_level_sah(rng):
    """VERDICT r4 #9: two-level open-merge. Many long rotated-instance
    boxes whose root AABBs massively overlap: the OPENED top-level SAH
    cost must land within 1.2x of a fully flattened single-level build,
    while the unopened (root-boxes-only) top level is far worse."""
    from embree_tpu.build.sah import BuildSettings, build_sah
    from embree_tpu.build.bvh import sah_cost
    from embree_tpu.build.twolevel import open_merge_entries
    from embree_tpu.scene.prims import prim_bounds_np

    # a long thin bar of triangles
    nseg = 60
    v0 = np.stack([np.linspace(0, 10, nseg), np.zeros(nseg),
                   np.zeros(nseg)], 1).astype(np.float32)
    e1 = np.array([0.1, 0.12, 0], np.float32)
    e2 = np.array([0.1, 0, 0.12], np.float32)
    lo, hi = prim_bounds_np(v0, v0 + e1, v0 + e2)
    bar = build_sah(lo, hi, BuildSettings())

    # 24 instances rotated about z through the same center: root AABBs
    # all cover the whole disc
    insts = []
    all_lo, all_hi = [], []
    for k in range(24):
        a = 2 * np.pi * k / 24
        R = np.array([[np.cos(a), -np.sin(a), 0],
                      [np.sin(a), np.cos(a), 0],
                      [0, 0, 1]], np.float32)
        l2w = np.concatenate([R, np.zeros((3, 1), np.float32)], 1)
        insts.append((l2w, np.asarray(bar.lower), np.asarray(bar.upper),
                      np.asarray(bar.child), np.asarray(bar.count)))
        all_lo.append(lo @ R.T)  # conservative enough for the flat ref
        wl = np.minimum(lo @ R.T, hi @ R.T)
        wh = np.maximum(lo @ R.T, hi @ R.T)
        all_lo[-1] = wl
        all_hi.append(wh)

    flat = build_sah(np.concatenate(all_lo), np.concatenate(all_hi),
                     BuildSettings())
    c_flat = sah_cost(flat)

    ent = open_merge_entries(insts, budget_factor=24.0)
    opened = build_sah(ent.lower, ent.upper, BuildSettings())
    c_open = sah_cost(opened)

    roots = open_merge_entries(insts, budget_factor=1.0)
    assert roots.lower.shape[0] <= 26
    unopened = build_sah(roots.lower, roots.upper, BuildSettings())
    c_roots = sah_cost(unopened)

    assert c_open <= 1.2 * c_flat, (c_open, c_flat)
    assert c_roots > 1.4 * c_flat, (c_roots, c_flat)  # roots overlap
    assert c_open < 0.85 * c_roots                    # opening mattered


def test_instance_cull_preserves_hits(rng):
    """The opened-entry traversal cull must not change results: the
    instanced scene must agree EXACTLY with a flattened copy."""
    from embree_tpu.verify.fixtures import triangle_sphere
    verts, idx = triangle_sphere((0, 0, 0), 1.0, 12)
    dev = et.Device("ignore_config_files=1")
    child = et.Scene(dev)
    child.attach(et.TriangleMesh(verts, idx))
    child.commit()
    top = et.Scene(dev)
    flat = et.Scene(dev)
    nv = np.asarray(verts)
    ni = np.asarray(idx)
    fv, fi = [], []
    for k in range(6):
        off = np.array([3.0 * k, 0, 0], np.float32)
        x = np.array([[1, 0, 0, off[0]], [0, 1, 0, 0], [0, 0, 1, 0]],
                     np.float32)
        top.attach(et.Instance(child, x))
        fv.append(nv + off)
        fi.append(ni + k * nv.shape[0])
    cs = top.commit()
    flat.attach(et.TriangleMesh(np.concatenate(fv), np.concatenate(fi)))
    fcs = flat.commit()
    assert cs.instances and cs.instances[0].cull_lower is not None
    org = rng.uniform(-2, 18, (500, 3)).astype(np.float32)
    d = rng.normal(size=(500, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = et.make_rays(org, d)
    h = et.scene_intersect(cs, rays, isa="xla")
    hf = et.scene_intersect(fcs, rays, isa="xla")
    np.testing.assert_array_equal(np.asarray(h.valid), np.asarray(hf.valid))
    m = np.asarray(hf.valid)
    np.testing.assert_allclose(np.asarray(h.t)[m], np.asarray(hf.t)[m],
                               rtol=1e-5)
