"""Statistical comparison against the reference's only checked-in render.

The reference ships exactly one rendered output: examples/sdl_quadrics.jpg
(referenced by its README.md:7), produced by the raysnail CLI from
sdl/quadric.sdl at 800x500. Rust cannot run in this image, so this is the
one executable render-level parity check available: compare that artifact
against this framework's committed render of the SAME scene
(docs/renders/quadric_sdl_400x250_36spp.png, created by
`python -m raysnail_tpu --scene sdl/quadric.sdl -w 400 --height 250
--samples 36`).

Method: box-downsample the reference 2x to 400x250 (which also averages
away much of its JPEG blocking + MC noise), then report PSNR, mean |diff|,
percentiles, pixel correlation, and the in-tolerance fraction. Residuals
are MC noise at 36spp plus silhouette-edge jitter; see
docs/REFERENCE_PARITY.md for the recorded numbers and interpretation.

Usage: python scripts/compare_reference.py
"""

import json
import math
import os

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_JPG = "/root/reference/examples/sdl_quadrics.jpg"
OURS_PNG = os.path.join(REPO, "docs", "renders", "quadric_sdl_400x250_36spp.png")


def compare(ref_path: str = REF_JPG, ours_path: str = OURS_PNG) -> dict:
    ref = np.asarray(Image.open(ref_path).convert("RGB"), np.float32) / 255.0
    ours = np.asarray(Image.open(ours_path).convert("RGB"), np.float32) / 255.0
    fy = ref.shape[0] // ours.shape[0]
    fx = ref.shape[1] // ours.shape[1]
    assert fy >= 1 and fx >= 1 and ref.shape[0] % ours.shape[0] == 0
    ref2 = ref.reshape(ours.shape[0], fy, ours.shape[1], fx, 3).mean((1, 3))
    diff = ref2 - ours
    m = float((diff ** 2).mean())
    return {
        "psnr_db": round(10 * math.log10(1.0 / m), 2),
        "mean_abs_diff": round(float(np.abs(diff).mean()), 5),
        "p50_abs_diff": round(float(np.percentile(np.abs(diff), 50)), 5),
        "p95_abs_diff": round(float(np.percentile(np.abs(diff), 95)), 5),
        "p99_abs_diff": round(float(np.percentile(np.abs(diff), 99)), 5),
        "pixel_correlation": round(float(np.corrcoef(ref2.ravel(), ours.ravel())[0, 1]), 5),
        "frac_within_0p05": round(float((np.abs(diff) < 0.05).mean()), 5),
        "channel_mean_ref": [round(float(x), 5) for x in ref2.mean((0, 1))],
        "channel_mean_ours": [round(float(x), 5) for x in ours.mean((0, 1))],
    }


if __name__ == "__main__":
    print(json.dumps(compare(), indent=2))
