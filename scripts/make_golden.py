#!/usr/bin/env python
"""Regenerate the golden regression anchors (tests/golden/golden.npz).

Run this ONLY after an intended estimator change, on the CPU backend, and
eyeball the PNGs it drops in docs/renders/golden/ before committing."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from raysnail_tpu.utils import golden  # noqa: E402


def main():
    os.makedirs(os.path.dirname(golden.GOLDEN_PATH), exist_ok=True)
    png_dir = os.path.join(golden.REPO, "docs", "renders", "golden")
    os.makedirs(png_dir, exist_ok=True)

    arrays = {}
    for name in golden.golden_configs():
        t0 = time.time()
        img = golden.render_anchor(name)
        stats = golden.anchor_stats(img)
        for field, value in stats.items():
            arrays[f"{name}/{field}"] = value
        print(f"{name}: {img.shape} mean={stats['mean']} "
              f"({time.time() - t0:.1f}s)")
        try:
            from PIL import Image
            Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(png_dir, f"{name.replace('.', '_')}.png"))
        except Exception as e:  # noqa: BLE001
            print(f"  (png skipped: {e})")

    np.savez(golden.GOLDEN_PATH, **arrays)
    print(f"wrote {golden.GOLDEN_PATH}")


if __name__ == "__main__":
    main()
