"""A/B the sphere-BVH pallas kernel vs the dense sweep on the book-1 balls
scene (478 spheres) at the benchmark config — the round-3 TODO's rtow_13_1
regression (1.81 Mrays/s with sphere_bvh=auto vs 8.77 dense in round 1).

Usage: python scripts/ab_spherebvh.py [--spheres-from-seg N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raysnail_tpu.config import RenderConfig
from raysnail_tpu.prelude import rng as prng
from raysnail_tpu.render import _sample_chunks, _tile_grid, make_sample_step
from raysnail_tpu.scenes import book1


def time_cfg(scene, camera, cfg, reps=3):
    step = make_sample_step(scene, cfg)
    px, py, _ = _tile_grid(cfg)
    px = jnp.asarray(px, cfg.dtype)
    py = jnp.asarray(py, cfg.dtype)
    key = prng.key(7)
    spp = cfg.effective_samples
    k = _sample_chunks(cfg, cfg.width * cfg.height)
    t0 = time.time()
    out = step(scene.arrays, camera, key, jnp.arange(k, dtype=jnp.int32), px, py)
    float(out.x.sum())
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        accum = None
        for start in range(0, spp, k):
            ids = jnp.arange(start, start + k, dtype=jnp.int32)
            sums = step(scene.arrays, camera, key, ids, px, py)
            accum = sums if accum is None else accum + sums
        float(accum.x.sum())
        best = min(best, time.time() - t0)
    mrays = cfg.width * cfg.height * spp / best / 1e6
    return mrays, compile_s, best


def main():
    scene = book1.balls_scene(7).compile()
    cam = book1.balls_camera(400, 225)
    base = RenderConfig(width=400, height=225, samples=16, max_depth=8)
    for mode in ("never", "auto"):
        cfg = base.replace(sphere_bvh=mode)
        mrays, cs, dt = time_cfg(scene, cam, cfg)
        print(f"sphere_bvh={mode:6s}: {mrays:7.2f} Mrays/s  "
              f"compile={cs:6.1f}s steady={dt:.3f}s", flush=True)


if __name__ == "__main__":
    main()
