#!/usr/bin/env python
"""Decompose the fwd+bwd step cost on TPU (bench example-fwd+bwd regressed
6.7 -> 0.067 Mrays/s between r1 and r3; CPU shows no blowup, so the cause is
TPU-side). Times, at the bench 400x250@16spp config:
  1. forward-only chunk_sums (pass 1 of the two-pass scheme),
  2. one chunk VJP,
  3. the full two-pass step (per-cell VJP accumulation),
  4. the single-chunk value_and_grad step (one_shot_max=spp),
  5. (4) with remat_bounces off.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from raysnail_tpu.config import RenderConfig
from raysnail_tpu.diff import make_train_step
from raysnail_tpu.diff.train import make_loss_fn, render_image_diff
from raysnail_tpu.diff.params import extract_params
from raysnail_tpu.sdl import build_scene


def timed(label, fn, reps=3):
    t0 = time.time()
    fn()
    c = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{label:34s} compile+1st={c:7.2f}s steady={best:7.3f}s", flush=True)
    return best


def main():
    cfg = RenderConfig(width=400, height=250, samples=16, max_depth=8)
    scene, cam = build_scene(os.path.join(REPO, "sdl", "example.sdl"), cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    ids = jnp.arange(cfg.effective_samples, dtype=jnp.int32)
    params = extract_params(scene.arrays)
    print("device:", jax.devices()[0], flush=True)

    # 1. forward-only (differentiable-config path, 5-cell chunk)
    @jax.jit
    def fwd5(p, k):
        return render_image_diff(scene, cam, cfg, p, k, ids[:5])
    timed("fwd chunk=5 (diff config)", lambda: float(fwd5(params, key).x.sum()))

    # 2. one 5-cell chunk VJP
    @jax.jit
    def vjp5(p, k):
        loss_fn = lambda pp: render_image_diff(scene, cam, cfg, pp, k, ids[:5]).x.sum()
        l, g = jax.value_and_grad(loss_fn)(p)
        return l
    timed("vjp chunk=5", lambda: float(vjp5(params, key)))

    # 3. full two-pass step (bench configuration; one VJP per cell)
    step, opt, p0 = make_train_step(scene, cam, cfg, target)
    state = [p0, opt]
    def run3():
        p, o, l = step(state[0], state[1], key, ids)
        state[0], state[1] = p, o
        return float(l)
    timed("two-pass step (per-cell VJPs)", run3)

    # 4. single-chunk value_and_grad
    step1, opt1, p1 = make_train_step(scene, cam, cfg, target, one_shot_max=16)
    state1 = [p1, opt1]
    def run1():
        p, o, l = step1(state1[0], state1[1], key, ids)
        state1[0], state1[1] = p, o
        return float(l)
    timed("single-chunk value_and_grad", run1)

    # 5. single-chunk, remat off
    cfg_nr = cfg.replace(remat_bounces=False)
    scene_nr, cam_nr = build_scene(os.path.join(REPO, "sdl", "example.sdl"), cfg_nr)
    step2, opt2, p2 = make_train_step(scene_nr, cam_nr, cfg_nr, target,
                                      one_shot_max=16)
    state2 = [p2, opt2]
    def run2():
        p, o, l = step2(state2[0], state2[1], key, ids)
        state2[0], state2[1] = p, o
        return float(l)
    timed("single-chunk, remat OFF", run2)


if __name__ == "__main__":
    main()
