"""Find the sphere-count crossover between the dense (rays x spheres) sweep
and the pallas BVH traversal kernel: synthetic jittered-grid sphere fields at
S = 478 .. 32k, rendered 400x225@16spp depth 4.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raysnail_tpu import ir
from raysnail_tpu.camera import build_camera
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.prelude import rng as prng
from raysnail_tpu.render import _sample_chunks, _tile_grid, make_sample_step
from raysnail_tpu.scene import SceneBuilder


def field_scene(s: int):
    rng = np.random.default_rng(11)
    side = int(np.ceil(np.sqrt(s)))
    b = SceneBuilder()
    n = 0
    for i in range(side):
        for j in range(side):
            if n >= s:
                break
            c = (i - side / 2 + rng.uniform(0, .7),
                 0.2, j - side / 2 + rng.uniform(0, .7))
            b.add(ir.Sphere(c, 0.2, ir.Lambertian(
                ir.Constant(tuple(rng.uniform(0.2, 0.9, 3))))))
            n += 1
    b.add(ir.Sphere((0, -1000, 0), 1000.0,
                    ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))))
    b.set_background((1.0, 1.0, 1.0), (0.5, 0.7, 1.0))
    return b.compile()


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
    return mrays, compile_s


def main():
    sizes = [int(x) for x in (sys.argv[1:] or ["478", "2048", "8192", "32768"])]
    base = RenderConfig(width=400, height=225, samples=16, max_depth=4)
    cam = build_camera(look_from=(0, 14, 26), look_at=(0, 0, 0), fov=40,
                       width=base.width, height=base.height)
    for s in sizes:
        scene = field_scene(s)
        row = [f"S={s:6d}"]
        for mode in ("never", "auto"):
            mrays, cs = time_cfg(scene, cam, base.replace(sphere_bvh=mode))
            row.append(f"{mode}={mrays:8.2f} Mrays/s (c={cs:5.1f}s)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
