import os

import numpy as np

from raysnail_tpu import ir
from raysnail_tpu.camera import build_camera
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.painter import RenderSession, RenderState
from raysnail_tpu.render import render
from raysnail_tpu.scene import SceneBuilder

CFG = RenderConfig(width=32, height=16, samples=16, max_depth=3, ray_batch=1 << 12)


def scene_and_cam():
    b = SceneBuilder()
    b.add(ir.Sphere((0.0, -100.5, -1.0), 100.0, ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))))
    b.add(ir.Sphere((0.0, 0.0, -1.0), 0.5, ir.Lambertian(ir.Constant((0.7, 0.3, 0.3)))))
    scene = b.compile()
    cam = build_camera(look_from=(0, 0, 1), look_at=(0, 0, -1), fov=50,
                       width=CFG.width, height=CFG.height)
    return scene, cam


def test_session_matches_plain_render():
    scene, cam = scene_and_cam()
    img_sess = RenderSession(scene, cam, CFG, seed=5).render()
    img_plain = render(scene, cam, CFG, seed=5)
    np.testing.assert_allclose(img_sess, img_plain, atol=1e-6)


def test_streaming_target_called_and_can_cancel():
    scene, cam = scene_and_cam()
    calls = []

    def target(done, total, img):
        calls.append((done, total))
        assert img.shape == (CFG.height, CFG.width, 3)
        return done < 8  # cancel midway

    small = CFG.replace(ray_batch=1 << 11)  # 4-cell chunks -> several calls
    RenderSession(scene, cam, small, seed=5).render(target=target)
    assert len(calls) >= 2
    assert calls[-1][0] >= 8


def test_checkpoint_resume_identical(tmp_path):
    scene, cam = scene_and_cam()
    ckpt = str(tmp_path / "state.npz")

    # run to completion, checkpointing every chunk
    sess = RenderSession(scene, cam, CFG, seed=5, checkpoint_path=ckpt)
    full = sess.render()

    # cancel halfway, then resume from the saved state
    sess2 = RenderSession(scene, cam, CFG, seed=5, checkpoint_path=ckpt)
    sess2.render(target=lambda done, total, img: done < CFG.effective_samples // 2)
    state = RenderState.load(ckpt)
    assert 0 < state.samples_done < CFG.effective_samples

    sess3 = RenderSession(scene, cam, CFG, seed=5)
    resumed = sess3.render(resume=state)
    np.testing.assert_allclose(resumed, full, atol=1e-5)

    assert sess.mrays_per_sec > 0
