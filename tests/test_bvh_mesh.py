import os

import jax.numpy as jnp
import numpy as np
import pytest

from raysnail_tpu import ir
from raysnail_tpu.accel.bvh import BvhArrays, build_bvh_numpy, LEAF_SIZE
from raysnail_tpu.accel.native import build as native_build
from raysnail_tpu.camera import Ray, build_camera
from raysnail_tpu.geometry import triangles
from raysnail_tpu.io.obj import load_obj, vertex_normals
from raysnail_tpu.prelude.vec import Vec3
from raysnail_tpu.scene import SceneBuilder
from raysnail_tpu.scenes.meshes import uv_sphere

ASSETS = os.path.join(os.path.dirname(__file__), "assets")


def _check_invariants(bvh: BvhArrays, n_prims: int):
    m = len(bvh.first)
    # every primitive appears exactly once
    order = bvh.prim_order[bvh.prim_order >= 0]
    assert sorted(order.tolist()) == list(range(n_prims))
    # skip links are forward-directed and bounded
    assert (bvh.miss > np.arange(m)).all()
    assert (bvh.miss <= m).all()
    # leaves have LEAF_SIZE-aligned runs
    leaves = bvh.count > 0
    assert (bvh.count[leaves] % LEAF_SIZE == 0).all()
    # child bboxes nest inside parents (spot-check root)
    assert (bvh.bb_min[0] <= bvh.bb_min.min(0) + 1e-5).all()


def test_bvh_numpy_invariants(rng_np):
    lo = rng_np.uniform(-10, 10, (300, 3)).astype(np.float32)
    hi = lo + rng_np.uniform(0.01, 1.0, (300, 3)).astype(np.float32)
    bvh = build_bvh_numpy(lo, hi)
    _check_invariants(bvh, 300)


def test_bvh_native_matches_invariants(rng_np):
    lo = rng_np.uniform(-10, 10, (500, 3)).astype(np.float32)
    hi = lo + rng_np.uniform(0.01, 1.0, (500, 3)).astype(np.float32)
    bvh = native_build.build_bvh_native(lo, hi, LEAF_SIZE)
    assert bvh is not None, "native builder failed to compile/run"
    _check_invariants(bvh, 500)


def _tri_group_from(v, f, n, mat=0):
    from raysnail_tpu.scene import _build_triangles

    spec = ir.Mesh(vertices=v, indices=f, normals=n)
    return _build_triangles([(spec, mat)], lambda a: jnp.asarray(np.asarray(a), jnp.float32))


def _brute_force_t(v, f, o, d, t_min=1e-3):
    """Reference brute-force closest triangle t per ray (numpy, f64)."""
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    best = np.full(len(o), np.inf)
    for i in range(len(f)):
        e1 = p1[i] - p0[i]
        e2 = p2[i] - p0[i]
        h = np.cross(d, e2)
        a = np.einsum("j,ij->i", e1, h)
        mask = np.abs(a) > 1e-12
        fworld = np.where(mask, 1.0 / np.where(mask, a, 1.0), 0.0)
        s = o - p0[i]
        u = fworld * np.einsum("ij,ij->i", s, h)
        q = np.cross(s, np.broadcast_to(e1, s.shape))
        vv = fworld * np.einsum("ij,ij->i", np.broadcast_to(d, s.shape), q)
        t = fworld * np.einsum("j,ij->i", e2, q)
        ok = mask & (u >= 0) & (u <= 1) & (vv >= 0) & (u + vv <= 1) & (t > t_min)
        best = np.where(ok & (t < best), t, best)
    return best


def test_bvh_traversal_matches_brute_force(rng_np):
    v, f, n = uv_sphere(8, 12)
    group = _tri_group_from(v, f, n)
    n_rays = 64
    o = np.stack([np.full(n_rays, 0.0), np.full(n_rays, 0.0), np.full(n_rays, 4.0)], -1)
    d = rng_np.standard_normal((n_rays, 3))
    d[:, 2] = -np.abs(d[:, 2]) - 1.0  # aim roughly at the sphere
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    ray = Ray(
        origin=Vec3.from_array(jnp.asarray(o, jnp.float32)),
        direction=Vec3.from_array(jnp.asarray(d, jnp.float32)),
        time=jnp.zeros(n_rays, jnp.float32),
    )
    h = triangles.intersect(group, ray, jnp.float32(1e-3), jnp.float32(1e30))
    expected = _brute_force_t(v, f, o, d)

    got = np.asarray(h.t)
    hit_exp = np.isfinite(expected)
    np.testing.assert_array_equal(np.asarray(h.valid), hit_exp)
    np.testing.assert_allclose(got[hit_exp], expected[hit_exp], rtol=2e-4)


def test_obj_loader_cube():
    v, f, n = load_obj(os.path.join(ASSETS, "cube.obj"))
    assert v.shape == (8, 3)
    assert f.shape == (12, 3)  # 6 quads fan-triangulated
    assert n is None
    vn = vertex_normals(v, f)
    np.testing.assert_allclose(np.linalg.norm(vn, axis=1), 1.0, rtol=1e-6)


def test_mesh_scene_renders():
    from raysnail_tpu import render as renderlib
    from raysnail_tpu.config import RenderConfig

    v, f, n = uv_sphere(12, 18, radius=1.0, center=(0.0, 0.0, -2.0))
    b = SceneBuilder()
    b.add(ir.Mesh(vertices=v, indices=f, normals=n,
                  material=ir.Lambertian(ir.Constant((0.8, 0.3, 0.3)))))
    cfg = RenderConfig(width=48, height=32, samples=4, max_depth=3, ray_batch=1 << 14)
    scene = b.compile()
    camera = build_camera(look_from=(0, 0, 1), look_at=(0, 0, -2), fov=50,
                          width=cfg.width, height=cfg.height)
    img = renderlib.render(scene, camera, cfg, seed=0)
    assert np.isfinite(img).all()
    # center shows the reddish sphere
    c = img[16, 24]
    assert c[0] > c[2]
