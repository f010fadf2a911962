"""Render-level parity gates vs the reference (docs/REFERENCE_PARITY.md).

The reference can't run here (no Rust toolchain), so the executable parity
evidence is (1) the statistical comparison against the one render the
reference ships (examples/sdl_quadrics.jpg) and (2) a stable, loadable
book-1 layout dump that makes seed-level parity testable the day the
reference can be patched to print its seed-7 draw.
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_JPG = "/root/reference/examples/sdl_quadrics.jpg"
LAYOUT = os.path.join(REPO, "tests", "assets", "book1_layout_seed7.json")


@pytest.mark.skipif(not os.path.exists(REF_JPG),
                    reason="reference tree not present")
def test_quadric_render_matches_reference_statistically():
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from compare_reference import compare

    m = compare()
    # recorded round-4 values at 800x500 @ 121 spp: corr 0.99916,
    # mean|d| 0.00795, PSNR 38.57 dB (round 3's 400x250@36spp read 28.4 —
    # noise-dominated)
    assert m["pixel_correlation"] >= 0.998, m
    assert m["mean_abs_diff"] <= 0.012, m
    assert m["psnr_db"] >= 35.0, m
    # global channel means agree within 1% (same integral)
    for r, o in zip(m["channel_mean_ref"], m["channel_mean_ours"]):
        assert abs(r - o) < 0.01, m


def test_book1_layout_dump_stable():
    """The committed seed-7 layout is exactly what generate_layout draws."""
    from raysnail_tpu.scenes.book1 import generate_layout

    with open(LAYOUT) as f:
        committed = json.load(f)
    assert committed["seed"] == 7
    fresh = generate_layout(7)
    assert committed["balls"] == fresh
    assert len(fresh) == 473
    kinds = {}
    for ball in fresh:
        kinds[ball["kind"]] = kinds.get(ball["kind"], 0) + 1
    # the 80/15/5 mix (scene.rs:44-67) within binomial tolerance
    assert abs(kinds["lambertian"] / len(fresh) - 0.8) < 0.06
    assert kinds["dielectric"] > 5


def test_book1_scene_from_layout_file():
    """balls_scene(layout_file=...) rebuilds the identical scene arrays."""
    from raysnail_tpu.scenes.book1 import balls_scene

    a = balls_scene(7).compile()
    b = balls_scene(layout_file=LAYOUT).compile()
    np.testing.assert_array_equal(np.asarray(a.arrays.spheres.center.x),
                                  np.asarray(b.arrays.spheres.center.x))
    np.testing.assert_array_equal(np.asarray(a.arrays.spheres.radius),
                                  np.asarray(b.arrays.spheres.radius))
    np.testing.assert_array_equal(np.asarray(a.arrays.spheres.mat_id),
                                  np.asarray(b.arrays.spheres.mat_id))
