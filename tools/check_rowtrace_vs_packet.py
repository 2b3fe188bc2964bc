"""Exactness gate at benchmark scale: rowtrace2 vs the pallas packet
kernel on the same 1M-prim scene and ray set (valid masks equal, t
allclose on hits)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax, jax.numpy as jnp
    import embree_tpu as et
    from embree_tpu.core.rayhit import Rays
    from embree_tpu.traverse.rowtrace2 import intersect_rowtrace2
    from embree_tpu.traverse.pallas_packet import intersect_pallas_raw
    from embree_tpu.traverse.stream import sort_rays_stream, unsort_by_perm
    from embree_tpu.verify.fixtures import triangle_sphere

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 707
    nrays = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 20)
    rng = np.random.default_rng(0xBE7C4)
    verts, idx = triangle_sphere((0.0, 0.0, 0.0), 2.0, res)
    dev = et.Device("ignore_config_files=1")
    scene = et.Scene(dev)
    scene.attach(et.TriangleMesh(verts, idx))
    cs = scene.commit()

    d = rng.normal(size=(nrays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = rng.uniform(-3.0, 3.0, (nrays, 3)).astype(np.float32)
    rays = et.make_rays(org, d)
    flat = Rays(rays.org.reshape(-1, 3), rays.dir.reshape(-1, 3),
                rays.tnear.reshape(-1), rays.tfar.reshape(-1))

    t_r, p_r = intersect_rowtrace2(cs.rowtrace, flat)
    t_r = np.asarray(t_r); p_r = np.asarray(p_r)
    print(f"rowtrace2: hits={int((p_r >= 0).sum())}", flush=True)

    srays, perm = sort_rays_stream(flat, cs.world_lower, cs.world_upper)
    t_s, p_s = intersect_pallas_raw(cs.pallas, srays)
    t_p, p_p = unsort_by_perm(perm, t_s, p_s)
    t_p = np.asarray(t_p); p_p = np.asarray(p_p)
    print(f"packet:    hits={int((p_p >= 0).sum())}", flush=True)

    vr = p_r >= 0
    vp = p_p >= 0
    if not np.array_equal(vr, vp):
        dif = np.nonzero(vr != vp)[0]
        print(f"VALID MISMATCH at {len(dif)} rays, e.g. {dif[:10]}")
        for i in dif[:5]:
            print(f"  ray {i}: rt prim={p_r[i]} t={t_r[i]}  "
                  f"pk prim={p_p[i]} t={t_p[i]}")
        return 1
    m = vr
    if not np.allclose(t_r[m], t_p[m], rtol=1e-5):
        bad = np.nonzero(~np.isclose(t_r[m], t_p[m], rtol=1e-5))[0]
        print(f"T MISMATCH at {len(bad)} hits")
        return 1
    same_prim = (p_r[m] == p_p[m]).mean()
    print(f"OK: masks equal, t allclose, prim agreement {same_prim:.4f} "
          "(<1 only on exact-t ties)")
    return 0


sys.exit(main())
