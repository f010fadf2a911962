#!/usr/bin/env python
"""Canonical follow-up A/B: predicated (cond-free) window retire and the
body-unroll probe. Variants: (regen_window, unroll) pairs from argv as
"W:U" tokens, default 0:1 0:2 0:3 -8:1 -8:2."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raysnail_tpu.config import RenderConfig
from raysnail_tpu.prelude import rng as prng
from raysnail_tpu.render import make_frame_step
from raysnail_tpu.sdl import build_scene

key = prng.key(7)
toks = sys.argv[1:] or ["0:1", "0:2", "0:3", "-8:1", "-8:2"]
for tok in toks:
    w, u = (int(x) for x in tok.split(":"))
    os.environ["RAYSNAIL_REGEN_UNROLL"] = str(u)
    # t_min nudge forces a retrace so the env unroll is re-read per variant
    cfg = RenderConfig(width=800, height=500, samples=65, max_depth=8,
                       regen_window=w, t_min=1e-3 * (1 + u * 1e-6))
    scene, cam = build_scene(os.path.join(REPO, "sdl", "example.sdl"), cfg)
    frame = make_frame_step(scene, cfg)
    t0 = time.time()
    float(frame(scene.arrays, cam, key).x.sum())
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(frame(scene.arrays, cam, key).x.sum())
        best = min(best, time.time() - t0)
    mr = cfg.width * cfg.height * cfg.effective_samples / best / 1e6
    print(f"W={w} U={u}: {best:.3f} s/frame  {mr:.1f} Mrays/s  "
          f"[compile {comp:.0f}s]", flush=True)
