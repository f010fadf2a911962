#!/usr/bin/env python
"""Canonical-frame breakdown: where the 800x500@64spp example.sdl frame time
goes, and how close it runs to the chip's ceiling (VERDICT r2 item 3).

Reports, for the shuffled path-regeneration frame step and the old scan step:
  * XLA cost_analysis flops / bytes of the compiled program,
  * steady-state wall time (best of N, host-fetch forced),
  * while_loop trip count (regen) and the implied ns per lane-iteration,
  * achieved GFLOP/s and HBM GB/s against v5e nominals -> roofline position.

Run on the TPU: python scripts/profile_canonical.py
Optionally: RAYSNAIL_PROFILE_TRACE=/tmp/trace captures a jax.profiler trace.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# v5e nominals (public): 197 TFLOP/s bf16 MXU, ~3.9 TFLOP/s f32 VPU
# (1024 lanes * 4 ALUs * 0.94 GHz), 16 GB HBM @ 819 GB/s
V5E_HBM_GBS = 819.0
V5E_VPU_GFLOPS = 3850.0  # 4 ALUs * 1024 lanes * 0.94 GHz, f32 elementwise


def regen_chunks(spp: int) -> int:
    """EXACTLY the chunk rule in integrator.radiance_regen_shuffle: C is the
    largest divisor of spp <= the RAYSNAIL_REGEN_C cap; the scan runs
    spp // C chunk iterations (ADVICE r3: the previous approximation here
    inflated per-iteration flops ~33% at spp=64)."""
    cap = int(os.environ.get("RAYSNAIL_REGEN_C", "21"))
    c = max(d for d in range(1, min(spp, cap) + 1) if spp % d == 0)
    return spp // c


def main():
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.integrator import radiance_regen_shuffle
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import make_sample_step
    from raysnail_tpu.sdl import build_scene

    cfg = RenderConfig(width=800, height=500, samples=65, max_depth=8)
    scene, camera = build_scene(os.path.join(REPO, "sdl", "example.sdl"), cfg)
    spp = cfg.effective_samples
    n_rays = cfg.width * cfg.height * spp
    print(f"device={jax.devices()[0]} canonical {cfg.width}x{cfg.height}@{spp}spp")

    # -- regen-shuffle frame step, returning the trip count ------------------
    @jax.jit
    def frame(arrays, cam, key):
        return radiance_regen_shuffle(scene, arrays, cfg, cam, key, spp)

    key = prng.key(7)
    lowered = frame.lower(scene.arrays, camera, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))

    t0 = time.time()
    sums, trips = compiled(scene.arrays, camera, key)
    trips = int(trips)
    float(sums.x.sum())
    warm = time.time() - t0

    best = float("inf")
    for _ in range(int(os.environ.get("REPS", "3"))):
        t0 = time.time()
        sums, tr = compiled(scene.arrays, camera, key)
        float(sums.x.sum())
        best = min(best, time.time() - t0)

    n_lanes = cfg.width * cfg.height
    # XLA cost_analysis counts loop bodies ONCE; the shuffle integrator runs
    # `trips` iterations total (across its chunk scan), so total work is
    # approximately body cost x trips. n_chunks scan iterations share the
    # counted body, so divide by n_chunks for the per-iteration body.
    n_chunks = regen_chunks(spp) if trips else 1
    flops_iter = flops / max(n_chunks, 1)
    total_flops = flops_iter * trips
    total_bytes = bytes_ / max(n_chunks, 1) * trips
    res = {
        "config": f"{cfg.width}x{cfg.height}@{spp}spp depth{cfg.max_depth}",
        "steady_s": round(best, 4),
        "mrays_primary": round(n_rays / best / 1e6, 1),
        "while_trips": trips,
        "trips_floor_sppxdepth": spp * cfg.max_depth,
        "ns_per_lane_iter": round(best / (trips * n_lanes) * 1e9, 3),
        "flops_per_lane_iter": round(flops_iter / n_lanes, 0),
        "est_total_gflop": round(total_flops / 1e9, 1),
        "achieved_gflops": round(total_flops / best / 1e9, 1),
        "achieved_hbm_gbs": round(total_bytes / best / 1e9, 1),
        "vpu_utilization_pct": round(
            total_flops / best / 1e9 / V5E_VPU_GFLOPS * 100, 1),
        "hbm_utilization_pct": round(
            total_bytes / best / 1e9 / V5E_HBM_GBS * 100, 1),
    }
    print(json.dumps({"regen_shuffle": res}, indent=1))

    trace_dir = os.environ.get("RAYSNAIL_PROFILE_TRACE")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            sums, _ = compiled(scene.arrays, camera, key)
            float(sums.x.sum())
        print("trace written to", trace_dir)

    # -- the scan integrator for comparison (the r1/r2 execution model) ------
    if os.environ.get("SKIP_SCAN") != "1":
        from raysnail_tpu.render import _sample_chunks, _tile_grid
        scfg = cfg.replace(path_regen="never")
        step = make_sample_step(scene, scfg)
        px, py, _ = _tile_grid(scfg)
        px = jnp.asarray(px, scfg.dtype)
        py = jnp.asarray(py, scfg.dtype)
        k = _sample_chunks(scfg, n_lanes)
        ids = jnp.arange(0, k, dtype=jnp.int32)
        t0 = time.time()
        float(step(scene.arrays, camera, key, ids, px, py).x.sum())
        scan_compile = time.time() - t0
        best_s = float("inf")
        for _ in range(3):
            t0 = time.time()
            acc = None
            for start in range(0, spp, k):
                s = step(scene.arrays, camera, key,
                         jnp.arange(start, start + k, dtype=jnp.int32), px, py)
                acc = s if acc is None else acc + s
            float(acc.x.sum())
            best_s = min(best_s, time.time() - t0)
        print(json.dumps({"scan": {
            "steady_s": round(best_s, 4),
            "mrays_primary": round(n_rays / best_s / 1e6, 1),
            "lane_iters": spp * cfg.max_depth,
            "regen_speedup": round(best_s / best, 2),
        }}, indent=1))


if __name__ == "__main__":
    main()
