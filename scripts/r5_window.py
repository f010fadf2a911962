#!/usr/bin/env python
"""Canonical-frame A/B of the sliding-window regen cell table
(cfg.regen_window, VERDICT r4 item 3) — same process, same tunnel session,
drift control first. XLA-only changes: compiles are seconds, not minutes."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(REPO, "scripts"))
import drift_control

from raysnail_tpu.config import RenderConfig
from raysnail_tpu.prelude import rng as prng
from raysnail_tpu.render import make_frame_step
from raysnail_tpu.sdl import build_scene

print("control:", drift_control.measure(), flush=True)

key = prng.key(7)
for w in [int(x) for x in (sys.argv[1:] or ["0", "8", "6", "4"])]:
    cfg = RenderConfig(width=800, height=500, samples=65, max_depth=8,
                       regen_window=w)
    scene, cam = build_scene(os.path.join(REPO, "sdl", "example.sdl"), cfg)
    frame = make_frame_step(scene, cfg)
    t0 = time.time()
    out = frame(scene.arrays, cam, key)
    sums, it = (out if isinstance(out, tuple) else (out, None))
    float(sums.x.sum())
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        r = frame(scene.arrays, cam, key)
        s2 = r[0] if isinstance(r, tuple) else r
        float(s2.x.sum())
        best = min(best, time.time() - t0)
    mr = cfg.width * cfg.height * cfg.effective_samples / best / 1e6
    print(f"W={w}: {best:.3f} s/frame  {mr:.1f} Mrays/s  [compile {comp:.0f}s]",
          flush=True)
