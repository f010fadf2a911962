"""Built-in scene coverage: cornell (incl. smoke + MIS), book-2 all-features
(perlin, image atlas, motion blur, media, rect light)."""

import numpy as np
import pytest

from raysnail_tpu import render as renderlib
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.scenes import book2, cornell

CFG = RenderConfig(width=40, height=40, samples=4, max_depth=4, ray_batch=1 << 14)


def test_cornell_empty_renders():
    scene = cornell.cornell_box(False, False, False).compile()
    cam = cornell.cornell_camera(CFG.width, CFG.height)
    img = renderlib.render(scene, cam, CFG, seed=0)
    assert np.isfinite(img).all()
    assert img.mean() > 0.05


def test_cornell_mis_vs_compat_exposure():
    """Compat estimator (hardcoded 1/pi) overexposes the big close light;
    proper MIS keeps radiance bounded."""
    scene = cornell.cornell_box(True, True, False).compile()
    cam = cornell.cornell_camera(CFG.width, CFG.height)
    cfg_lin = CFG.replace(gamma=False, samples=9)
    img_compat = renderlib.render(scene, cam, cfg_lin, seed=1)
    img_mis = renderlib.render(scene, cam, cfg_lin.replace(proper_mis=True), seed=1)
    assert np.isfinite(img_mis).all()
    assert img_mis.mean() < img_compat.mean()
    assert 0.005 < img_mis.mean() < 1.0


def test_cornell_smoke_renders():
    scene = cornell.cornell_box(True, True, True).compile()
    assert scene.static.n_media == 2
    cam = cornell.cornell_camera(CFG.width, CFG.height)
    img = renderlib.render(scene, cam, CFG, seed=0)
    assert np.isfinite(img).all()
    assert img.mean() > 0.02  # smoke scatters light into view


def test_book2_compiles_and_renders():
    scene = book2.all_feature_scene(7).compile()
    # every material/texture family present
    assert scene.static.n_media == 2
    assert scene.arrays.triangles is None
    assert scene.arrays.textures.atlas is not None    # image texture
    assert scene.arrays.textures.perlin_seed is not None
    assert scene.static.moving                         # motion blur
    cam = book2.book2_camera(CFG.width, CFG.height)
    img = renderlib.render(scene, cam, CFG.replace(samples=4), seed=0)
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
