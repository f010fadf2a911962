"""Dense triangle sweep vs BVH traversal equivalence."""

import jax.numpy as jnp
import numpy as np

from raysnail_tpu import ir
from raysnail_tpu.camera import Ray
from raysnail_tpu.geometry import triangles
from raysnail_tpu.prelude.vec import Vec3
from raysnail_tpu.scene import _build_triangles
from raysnail_tpu.scenes.meshes import torus_knot, uv_sphere

TMIN, TMAX = jnp.float32(1e-3), jnp.float32(1e30)


def _group(v, f, n):
    spec = ir.Mesh(vertices=v, indices=f, normals=n)
    return _build_triangles([(spec, 0)], lambda a: jnp.asarray(np.asarray(a), jnp.float32))


def test_brute_matches_bvh(rng_np):
    v, f, n = torus_knot(n_seg=60, n_ring=12)
    group = _group(v, f, n)
    n_rays = 256
    o = rng_np.uniform(-3, 3, (n_rays, 3)).astype(np.float32)
    d = rng_np.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(
        origin=Vec3.from_array(jnp.asarray(o)),
        direction=Vec3.from_array(jnp.asarray(d)),
        time=jnp.zeros(n_rays, jnp.float32),
    )
    h_bvh = triangles.intersect(group, ray, TMIN, TMAX)
    h_brute = triangles.intersect_brute(group, ray, TMIN, TMAX)
    np.testing.assert_array_equal(np.asarray(h_bvh.valid), np.asarray(h_brute.valid))
    both = np.asarray(h_bvh.valid)
    np.testing.assert_allclose(
        np.asarray(h_bvh.t)[both], np.asarray(h_brute.t)[both], rtol=1e-5
    )
    nb = np.asarray(h_bvh.normal.to_array())[both]
    nr = np.asarray(h_brute.normal.to_array())[both]
    np.testing.assert_allclose(nb, nr, atol=1e-4)


def test_scene_picks_brute_for_small_mesh():
    from raysnail_tpu.scene import SceneBuilder

    v, f, n = uv_sphere(8, 12)
    b = SceneBuilder()
    b.add(ir.Mesh(vertices=v, indices=f, normals=n, material=ir.Lambertian()))
    scene = b.compile()
    assert scene.static.tri_brute
