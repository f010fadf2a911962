"""Pallas kernel correctness vs the jnp reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raysnail_tpu.camera import Ray
from raysnail_tpu.geometry import spheres
from raysnail_tpu.ops import sphere_pallas as sp
from raysnail_tpu.prelude.vec import Vec3

TMIN, TMAX = jnp.float32(1e-3), jnp.float32(1e30)


def random_setup(rng, n_rays=700, n_spheres=130):
    centers = rng.uniform(-10, 10, (n_spheres, 3)).astype(np.float32)
    radii = rng.uniform(0.3, 1.5, n_spheres).astype(np.float32)
    g = spheres.SphereGroup(
        center=Vec3.from_array(jnp.asarray(centers)),
        radius=jnp.asarray(radii),
        speed=Vec3.zeros((n_spheres,)),
        mat_id=jnp.arange(n_spheres, dtype=jnp.int32),
        active=jnp.ones(n_spheres, bool),
    )
    o = rng.uniform(-15, 15, (n_rays, 3)).astype(np.float32)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(
        origin=Vec3.from_array(jnp.asarray(o)),
        direction=Vec3.from_array(jnp.asarray(d)),
        time=jnp.zeros(n_rays, jnp.float32),
    )
    return g, ray


def test_pallas_matches_jnp(rng_np):
    g, ray = random_setup(rng_np)
    h_ref = spheres.intersect(g, ray, TMIN, TMAX)
    h_pl = spheres.intersect(g, ray, TMIN, TMAX, use_pallas=True,
                             pallas_interpret=True)
    # fused-XLA and kernel differ by fma rounding order; allow f32-level slop
    valid_match = np.asarray(h_ref.valid) == np.asarray(h_pl.valid)
    assert valid_match.mean() > 0.995  # boundary-epsilon cases only
    both = np.asarray(h_ref.valid) & np.asarray(h_pl.valid)
    np.testing.assert_allclose(
        np.asarray(h_ref.t)[both], np.asarray(h_pl.t)[both], rtol=5e-4
    )
    same_winner = (np.asarray(h_ref.mat_id)[both] == np.asarray(h_pl.mat_id)[both])
    assert same_winner.mean() > 0.99  # ties/rounding may flip rare winners


def test_pallas_padding_edges(rng_np):
    # n_rays not a multiple of TILE_R; n_spheres not a multiple of LANES
    # (>= 64 so the pallas path actually engages)
    g, ray = random_setup(rng_np, n_rays=sp.TILE_R + 3, n_spheres=69)
    h_ref = spheres.intersect(g, ray, TMIN, TMAX)
    h_pl = spheres.intersect(g, ray, TMIN, TMAX, use_pallas=True,
                             pallas_interpret=True)
    np.testing.assert_allclose(np.asarray(h_ref.t), np.asarray(h_pl.t), rtol=5e-4)


def test_force_config_end_to_end(rng_np):
    from raysnail_tpu import ir, render as renderlib
    from raysnail_tpu.camera import build_camera
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.scene import SceneBuilder

    rng = np.random.default_rng(3)
    b = SceneBuilder()
    b.add(ir.Sphere((0.0, -100.5, -1.0), 100.0, ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))))
    b.add(ir.Sphere((0.0, 0.0, -1.0), 0.5, ir.Lambertian(ir.Constant((0.7, 0.3, 0.3)))))
    for _ in range(70):  # enough spheres that the pallas gate engages
        c = rng.uniform(-6, 6, 3); c[2] -= 8.0
        b.add(ir.Sphere(tuple(c), 0.3, ir.Lambertian(ir.Constant(tuple(rng.random(3))))))
    scene = b.compile()
    cfg = RenderConfig(width=24, height=16, samples=4, max_depth=3,
                       ray_batch=1 << 12, gamma=False)
    cam = build_camera(look_from=(0, 0, 1), look_at=(0, 0, -1), fov=50,
                       width=cfg.width, height=cfg.height)
    img_ref = renderlib.render(scene, cam, cfg, seed=0)
    img_pl = renderlib.render(scene, cam, cfg.replace(use_pallas="force"), seed=0)
    np.testing.assert_allclose(img_ref, img_pl, atol=1e-5)
