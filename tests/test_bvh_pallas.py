"""Packet BVH traversal kernel vs the XLA traversal (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from raysnail_tpu import ir
from raysnail_tpu.camera import Ray
from raysnail_tpu.geometry import triangles
from raysnail_tpu.prelude.vec import Vec3
from raysnail_tpu.scene import _build_triangles
from raysnail_tpu.scenes.meshes import uv_sphere

TMIN, TMAX = jnp.float32(1e-3), jnp.float32(1e30)


def _group(v, f, n):
    spec = ir.Mesh(vertices=v, indices=f, normals=n)
    return _build_triangles([(spec, 0)], lambda a: jnp.asarray(np.asarray(a), jnp.float32))


def test_packet_traversal_matches_reference(rng_np):
    v, f, n = uv_sphere(10, 14, center=(0.0, 0.0, -3.0))
    group = _group(v, f, n)
    n_rays = 300  # not a multiple of TILE_R -> exercises padding
    o = rng_np.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
    d = rng_np.standard_normal((n_rays, 3)).astype(np.float32)
    d[:, 2] -= 2.0  # aim forward-ish
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(
        origin=Vec3.from_array(jnp.asarray(o)),
        direction=Vec3.from_array(jnp.asarray(d)),
        time=jnp.zeros(n_rays, jnp.float32),
    )
    h_ref = triangles.intersect(group, ray, TMIN, TMAX)
    h_pk = triangles.intersect_pallas(group, ray, TMIN, TMAX, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_ref.valid), np.asarray(h_pk.valid))
    both = np.asarray(h_ref.valid)
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[both], np.asarray(h_pk.t)[both], rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(h_ref.normal.to_array())[both],
        np.asarray(h_pk.normal.to_array())[both], atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.mat_id)[both], np.asarray(h_pk.mat_id)[both])
    # octant-sorted path: permutation must round-trip exactly
    h_srt = triangles.intersect_pallas(group, ray, TMIN, TMAX,
                                       interpret=True, sort_rays=True)
    np.testing.assert_array_equal(np.asarray(h_pk.valid), np.asarray(h_srt.valid))
    np.testing.assert_array_equal(np.asarray(h_pk.t), np.asarray(h_srt.t))
    np.testing.assert_array_equal(
        np.asarray(h_pk.mat_id), np.asarray(h_srt.mat_id))


def test_active_mask_suppresses_dead_lanes(rng_np):
    """Dead lanes must come back as misses without affecting live lanes."""
    v, f, n = uv_sphere(8, 12, center=(0.0, 0.0, -3.0))
    group = _group(v, f, n)
    n_rays = 256
    o = rng_np.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
    d = rng_np.standard_normal((n_rays, 3)).astype(np.float32)
    d[:, 2] -= 2.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(
        origin=Vec3.from_array(jnp.asarray(o)),
        direction=Vec3.from_array(jnp.asarray(d)),
        time=jnp.zeros(n_rays, jnp.float32),
    )
    alive = rng_np.random(n_rays) < 0.5
    h_all = triangles.intersect_pallas(group, ray, TMIN, TMAX, interpret=True)
    h_msk = triangles.intersect_pallas(group, ray, TMIN, TMAX,
                                       active=jnp.asarray(alive),
                                       interpret=True)
    np.testing.assert_array_equal(
        np.asarray(h_msk.valid), np.asarray(h_all.valid) & alive)
    live_hit = np.asarray(h_all.valid) & alive
    np.testing.assert_array_equal(
        np.asarray(h_msk.t)[live_hit], np.asarray(h_all.t)[live_hit])


def test_sphere_bvh_kernel_matches_dense(rng_np):
    """kind="sphere" traversal vs the dense XLA sweep on a big sphere set."""
    from raysnail_tpu import ir
    from raysnail_tpu.geometry import spheres
    from raysnail_tpu.scene import SceneBuilder

    b = SceneBuilder()
    centers = rng_np.uniform(-4, 4, (96, 3))
    for i, c in enumerate(centers):
        b.add(ir.Sphere(tuple(c), 0.25 + 0.05 * (i % 4),
                        ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))))
    scene = b.compile()
    group = scene.arrays.spheres
    assert group.pk_bb is not None  # >= 64 static spheres -> packed

    n_rays = 300
    o = rng_np.uniform(-6, 6, (n_rays, 3)).astype(np.float32)
    d = rng_np.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(
        origin=Vec3.from_array(jnp.asarray(o)),
        direction=Vec3.from_array(jnp.asarray(d)),
        time=jnp.zeros(n_rays, jnp.float32),
    )
    h_ref = spheres.intersect(group, ray, TMIN, TMAX)
    h_pk = spheres.intersect(group, ray, TMIN, TMAX,
                             use_bvh=True, bvh_interpret=True)
    np.testing.assert_array_equal(np.asarray(h_ref.valid), np.asarray(h_pk.valid))
    both = np.asarray(h_ref.valid)
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[both], np.asarray(h_pk.t)[both], rtol=5e-4)
    np.testing.assert_array_equal(
        np.asarray(h_ref.mat_id)[both], np.asarray(h_pk.mat_id)[both])
    np.testing.assert_allclose(
        np.asarray(h_ref.normal.to_array())[both],
        np.asarray(h_pk.normal.to_array())[both], atol=2e-3)


def test_hbm_leaf_streaming_matches_resident(rng_np):
    """stream=True (HBM leaf blocks + DMA ring) must be bit-identical to the
    VMEM-resident path."""
    from raysnail_tpu.ops import bvh_pallas

    v, f, n = uv_sphere(12, 16, center=(0.0, 0.0, -3.0))
    group = _group(v, f, n)
    n_rays = bvh_pallas.TILE_R
    o = rng_np.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
    d = rng_np.standard_normal((n_rays, 3)).astype(np.float32)
    d[:, 2] -= 2.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    args = (
        (jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        (jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
        jnp.full(n_rays, 1e30, jnp.float32),
        group.pk_bb, group.pk_links, group.pk_tri,
        TMIN, TMAX,
    )
    kind = ("tri_mxu" if group.pk_tri.shape[2] == bvh_pallas.MXU_LANES
            else "tri")
    res = bvh_pallas.bvh_traverse(*args, kind=kind, interpret=True,
                                  stream=False)
    strm = bvh_pallas.bvh_traverse(*args, kind=kind, interpret=True,
                                   stream=True)
    for a, b in zip(res, strm):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_box_bvh_kernel_matches_dense(rng_np):
    """kind="box" traversal vs the dense XLA slab sweep on a book2-style
    random-height box grid (scene.rs:341-358)."""
    from raysnail_tpu import ir
    from raysnail_tpu.geometry import boxes
    from raysnail_tpu.scene import SceneBuilder

    b = SceneBuilder()
    mat = ir.Lambertian(ir.Constant((0.48, 0.83, 0.53)))
    w = 1.0
    for i in range(12):
        for j in range(12):
            x0, z0 = -6.0 + i * w, -6.0 + j * w
            y1 = 0.1 + rng_np.random() * 2.0
            b.add(ir.Box((x0, 0.0, z0), (x0 + w, y1, z0 + w), mat))
    scene = b.compile()
    group = scene.arrays.boxes
    assert group.pk_bb is not None  # 144 boxes >= BOX_BVH_MIN_BUILD

    n_rays = 300
    o = rng_np.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    o[:, 1] = rng_np.uniform(0.5, 6.0, n_rays)
    d = rng_np.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(
        origin=Vec3.from_array(jnp.asarray(o)),
        direction=Vec3.from_array(jnp.asarray(d)),
        time=jnp.zeros(n_rays, jnp.float32),
    )
    h_ref = boxes.intersect(group, ray, TMIN, TMAX)
    h_pk = boxes.intersect_pallas(group, ray, TMIN, TMAX, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_ref.valid), np.asarray(h_pk.valid))
    both = np.asarray(h_ref.valid)
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[both], np.asarray(h_pk.t)[both], rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(h_ref.normal.to_array())[both],
        np.asarray(h_pk.normal.to_array())[both], atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(h_ref.u)[both], np.asarray(h_pk.u)[both], atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(h_ref.v)[both], np.asarray(h_pk.v)[both], atol=2e-3)
    np.testing.assert_array_equal(
        np.asarray(h_ref.mat_id)[both], np.asarray(h_pk.mat_id)[both])
    np.testing.assert_array_equal(
        np.asarray(h_ref.outside)[both], np.asarray(h_pk.outside)[both])


def test_box_kernel_inside_start(rng_np):
    """Rays starting INSIDE a box must report the exit face (box.rs:131-134)
    through the kernel too."""
    from raysnail_tpu import ir
    from raysnail_tpu.geometry import boxes
    from raysnail_tpu.scene import SceneBuilder

    b = SceneBuilder()
    mat = ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))
    for i in range(12):
        for j in range(12):
            b.add(ir.Box((i * 2.0, 0.0, j * 2.0),
                         (i * 2.0 + 1.5, 3.0, j * 2.0 + 1.5), mat))
    scene = b.compile()
    group = scene.arrays.boxes
    n_rays = 128
    # all rays start inside box (0, 0): origin in its interior
    o = rng_np.uniform(0.2, 1.3, (n_rays, 3)).astype(np.float32)
    o[:, 1] = rng_np.uniform(0.5, 2.5, n_rays)
    d = rng_np.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(
        origin=Vec3.from_array(jnp.asarray(o)),
        direction=Vec3.from_array(jnp.asarray(d)),
        time=jnp.zeros(n_rays, jnp.float32),
    )
    h_ref = boxes.intersect(group, ray, TMIN, TMAX)
    h_pk = boxes.intersect_pallas(group, ray, TMIN, TMAX, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_ref.valid), np.asarray(h_pk.valid))
    both = np.asarray(h_ref.valid)
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[both], np.asarray(h_pk.t)[both], rtol=5e-4)
    np.testing.assert_allclose(
        np.asarray(h_ref.normal.to_array())[both],
        np.asarray(h_pk.normal.to_array())[both], atol=1e-3)
