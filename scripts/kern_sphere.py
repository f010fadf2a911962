#!/usr/bin/env python
"""Amortized full-kernel probes: sphere kernel on rtow_13_1 primaries vs the
dense XLA sweep, with per-packet cost breakdown."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPS = 32


def bench(fn, *args, label="", n=1):
    t0 = time.time()
    float(jnp.sum(fn(*args)))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(fn(*args)))
        best = min(best, time.time() - t0)
    best /= REPS
    print(f"{label}: {best*1e3:7.2f} ms/call ({n/best/1e6:7.2f} Mrays/s)"
          f" [compile {comp:.0f}s]", flush=True)


def main():
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.camera import generate_rays
    from raysnail_tpu.geometry import spheres as sphlib
    from raysnail_tpu.ops import bvh_pallas
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import _tile_grid
    from raysnail_tpu.scenes import book1

    print("device:", jax.devices()[0],
          "CHUNK:", bvh_pallas.CHUNK, flush=True)
    cfg = RenderConfig(width=400, height=225, samples=16, max_depth=8)
    scene = book1.balls_scene(7).compile()
    cam = book1.balls_camera(cfg.width, cfg.height)
    g = scene.arrays.spheres
    print("spheres:", g.radius.shape[0], "blocks:", g.pk_sph.shape[0],
          "nodes:", g.pk_bb.shape[0], flush=True)

    px, py, _ = _tile_grid(cfg)
    px = jnp.asarray(px, cfg.dtype); py = jnp.asarray(py, cfg.dtype)
    keys = prng.fast_streams(prng.key(7), (py * cfg.width + px).astype(jnp.int32))
    ray = generate_rays(cam, px, py, jnp.zeros_like(px), jnp.zeros_like(py),
                        4, cfg.width, cfg.height, keys)
    n = px.shape[0]
    npk = n + ((-n) % bvh_pallas.TILE_R)
    pd = lambda a: jnp.pad(a, (0, npk - n))

    @jax.jit
    def kern(g, ray):
        def body(c, _):
            t, *_r = bvh_pallas.bvh_traverse(
                (pd(ray.origin.x), pd(ray.origin.y), pd(ray.origin.z)),
                (pd(ray.direction.x), pd(ray.direction.y), pd(ray.direction.z)),
                jnp.full((npk,), 1e30, jnp.float32),
                g.pk_bb, g.pk_links, g.pk_sph,
                jnp.float32(1e-3), jnp.float32(3e4), kind="sphere")
            return c + t.sum() * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c

    @jax.jit
    def dense(g, ray):
        def body(c, _):
            h = sphlib.intersect(g, ray, jnp.float32(1e-3), jnp.float32(3e4),
                                 need_uv=False)
            return c + h.t.sum() * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c

    @jax.jit
    def kern_full(g, ray):
        # kernel + the finalize wrapper (what the integrator actually calls)
        def body(c, _):
            h = sphlib.intersect(g, ray, jnp.float32(1e-3), jnp.float32(3e4),
                                 need_uv=False, use_bvh=True)
            return c + h.t.sum() * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c

    bench(dense, g, ray, label="dense XLA sweep (478 sph)", n=n)
    bench(kern, g, ray, label="sphere kernel (raw)      ", n=n)
    bench(kern_full, g, ray, label="sphere kernel (+finish)  ", n=n)


if __name__ == "__main__":
    main()
