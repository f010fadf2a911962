"""Stochastic-equivalence harness: independent RNG streams of the same scene
match; different scenes don't."""

import numpy as np
import pytest

from raysnail_tpu import ir
from raysnail_tpu.camera import build_camera
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.render import render
from raysnail_tpu.scene import SceneBuilder
from raysnail_tpu.utils.compare import assert_stochastic_match, compare, psnr

CFG = RenderConfig(width=48, height=32, samples=49, max_depth=4,
                   ray_batch=1 << 15, gamma=False)


def scene(albedo=(0.6, 0.3, 0.2)):
    b = SceneBuilder()
    b.add(ir.Sphere((0.0, -100.5, -1.0), 100.0, ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))))
    b.add(ir.Sphere((0.0, 0.0, -1.0), 0.5, ir.Lambertian(ir.Constant(albedo))))
    return b.compile()


def cam():
    return build_camera(look_from=(0, 0, 1), look_at=(0, 0, -1), fov=50,
                        width=CFG.width, height=CFG.height)


def test_independent_seeds_match():
    s = scene()
    a = render(s, cam(), CFG, seed=1)
    b = render(s, cam(), CFG, seed=2)
    stats = assert_stochastic_match(a, b)
    assert stats["psnr_db"] > 25


def test_different_scene_detected():
    a = render(scene(), cam(), CFG, seed=1)
    b = render(scene(albedo=(0.1, 0.8, 0.8)), cam(), CFG, seed=1)
    with pytest.raises(AssertionError):
        assert_stochastic_match(a, b)


def test_psnr_identity():
    a = np.random.default_rng(0).random((8, 8, 3))
    assert psnr(a, a) == float("inf")
    stats = compare(a, np.clip(a + 0.01, 0, 1))
    assert 35 < stats["psnr_db"] < 45
