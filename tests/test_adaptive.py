"""Adaptive multi-pass driver: noise metric (incl. bug-compat mode), redo
compaction, pass averaging."""

import numpy as np

from raysnail_tpu import ir
from raysnail_tpu.camera import build_camera
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.render import calc_noise, render, render_passes
from raysnail_tpu.scene import SceneBuilder

CFG = RenderConfig(width=32, height=24, samples=4, max_depth=3, ray_batch=1 << 13)


def scene_and_cam():
    b = SceneBuilder()
    b.add(ir.Sphere((0.0, -100.5, -1.0), 100.0, ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))))
    b.add(ir.Sphere((0.0, 0.0, -1.0), 0.5, ir.Metal(ir.Constant((0.9, 0.8, 0.7)))))
    scene = b.compile()
    cam = build_camera(look_from=(0, 0, 1), look_at=(0, 0, -1), fov=50,
                       width=CFG.width, height=CFG.height)
    return scene, cam


def test_noise_flat_image_is_zero():
    img = np.full((16, 16, 3), 0.25, np.float32)
    assert calc_noise(img).max() == 0.0
    assert calc_noise(img, compat_bug=True).max() == 0.0


def test_noise_detects_speckle():
    img = np.zeros((16, 16, 3), np.float32)
    img[8, 8] = 1.0
    n = calc_noise(img)
    assert n[8, 8] > 0.0
    assert n[8, 10] > 0.0      # inside the 5x5 window
    assert n[0, 0] == 0.0      # far away untouched


def test_noise_bug_mode_differs():
    rng = np.random.default_rng(0)
    img = rng.random((16, 16, 3)).astype(np.float32)
    n_fixed = calc_noise(img, compat_bug=False)
    n_bug = calc_noise(img, compat_bug=True)
    assert np.abs(n_fixed - n_bug).max() > 0.0


def test_passes_converge_toward_high_spp():
    scene, cam = scene_and_cam()
    cfg = CFG.replace(gamma=False)
    one = render_passes(scene, cam, cfg.replace(passes=1), seed=0)
    four = render_passes(scene, cam, cfg.replace(passes=4), seed=0)
    ref = render(scene, cam, cfg.replace(samples=36), seed=9)
    # multi-pass averaging should reduce error vs a high-spp reference
    err_one = np.abs(one - ref).mean()
    err_four = np.abs(four - ref).mean()
    assert err_four <= err_one * 1.05  # allow slack; passes touch noisy px only


def test_spp_square_compat():
    assert RenderConfig(samples=65).effective_samples == 64
    assert RenderConfig(samples=122).effective_samples == 121
    assert RenderConfig(samples=65, compat_spp_square=False).effective_samples == 65
