"""Beer-Lambert dielectric absorption (extension; reference only has the
flat rgb tint, dielectric.rs:82-93)."""

import numpy as np

from raysnail_tpu import ir
from raysnail_tpu.camera import build_camera
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.render import render
from raysnail_tpu.scene import SceneBuilder


def _scene(absorption):
    b = SceneBuilder()
    b.add(ir.Sphere((0, 0, -2), 0.8,
                    ir.Dielectric(ior=1.5, absorption=absorption)))
    b.set_background((1, 1, 1), (1, 1, 1))
    return b.compile()


CFG = RenderConfig(width=40, height=30, samples=9, max_depth=6)
CAM = build_camera(look_from=(0, 0, 0), look_at=(0, 0, -1), fov=50,
                   width=40, height=30)


def test_zero_absorption_matches_plain_dielectric():
    img0 = np.asarray(render(_scene((0.0, 0.0, 0.0)), CAM, CFG, seed=3))
    plain = np.asarray(render(_scene((0.0, 0.0, 0.0))
                              if False else _plain(), CAM, CFG, seed=3))
    np.testing.assert_allclose(img0, plain, atol=1e-6)


def _plain():
    b = SceneBuilder()
    b.add(ir.Sphere((0, 0, -2), 0.8, ir.Dielectric(ior=1.5)))
    b.set_background((1, 1, 1), (1, 1, 1))
    return b.compile()


def test_absorption_darkens_and_tints_interior_paths():
    img0 = np.asarray(render(_scene((0.0, 0.0, 0.0)), CAM, CFG, seed=3))
    # absorb green+blue strongly -> glass region goes red-ish and darker
    img1 = np.asarray(render(_scene((0.05, 2.0, 2.0)), CAM, CFG, seed=3))
    assert np.isfinite(img1).all()
    h, w = CFG.height, CFG.width
    center0 = img0[h // 2 - 4:h // 2 + 4, w // 2 - 4:w // 2 + 4]
    center1 = img1[h // 2 - 4:h // 2 + 4, w // 2 - 4:w // 2 + 4]
    # green/blue attenuated through the glass
    assert center1[..., 1].mean() < 0.7 * center0[..., 1].mean()
    assert center1[..., 2].mean() < 0.7 * center0[..., 2].mean()
    # red barely touched
    assert center1[..., 0].mean() > 0.8 * center0[..., 0].mean()
    # background pixels (no glass) unchanged
    corner0 = img0[:3, :3]
    corner1 = img1[:3, :3]
    np.testing.assert_allclose(corner1, corner0, atol=1e-5)
