#!/usr/bin/env python
"""Per-STAGE breakdown of the canonical frame (VERDICT r3 item 2).

profile_canonical.py gives the aggregate roofline; this script splits the
regen-shuffle loop body into its stages by microbenching each one on a
canonical-size lane batch (800*500 lanes) inside a single jitted scan
(REPS in-jit repetitions, so the axon dispatch round-trip amortizes away):

  rng          per-bounce uniform draws (fold + fmix32 rounds)
  intersect    full scene intersection (spheres + quadric CSG + rects ...)
  shade        one full bounce body (_make_shade): intersect + textures +
               materials + light sampling + direction update
  raygen       fresh camera rays for regenerated lanes (new_ray cost)

The full-frame body time comes from the measured frame: steady_s / trips.
Derived shares:
  shading-math  = shade - intersect - rng
  bookkeeping   = body - shade - raygen   (one-hot cell adds, regen selects,
                                           loop plumbing)
Each stage also reports XLA cost_analysis flops/bytes per lane-iteration.
Run on the TPU; prints one JSON blob.
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

REPS = int(os.environ.get("REPS", "32"))


def timed(fn, *args):
    """Compile + best-of-5 steady time of fn (already scan-amortized)."""
    t0 = time.time()
    float(jnp.asarray(fn(*args)).sum())
    comp = time.time() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        float(jnp.asarray(fn(*args)).sum())
        best = min(best, time.time() - t0)
    return best / REPS, comp


def cost(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("flops", 0.0)) / REPS, float(
        ca.get("bytes accessed", 0.0)) / REPS


def main():
    from raysnail_tpu import scene as scenelib
    from raysnail_tpu.camera import Ray, generate_rays
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.integrator import (_make_shade, _pallas_policy,
                                         _slot_layout)
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.prelude.vec import Vec3
    from raysnail_tpu.sdl import build_scene

    cfg = RenderConfig(width=int(os.environ.get("W", "800")),
                       height=int(os.environ.get("H", "500")),
                       samples=int(os.environ.get("SPP", "65")), max_depth=8)
    scene, camera = build_scene(os.path.join(REPO, "sdl", "example.sdl"), cfg)
    n = cfg.width * cfg.height
    print(f"device={jax.devices()[0]} lanes={n}", flush=True)

    pixel_ids = jnp.arange(n, dtype=jnp.int32)
    px = (pixel_ids % cfg.width).astype(cfg.dtype)
    py = (pixel_ids // cfg.width).astype(cfg.dtype)
    keys0 = prng.fast_streams(prng.key(7), pixel_ids)
    ray = generate_rays(camera, px, py, jnp.zeros_like(px), jnp.zeros_like(py),
                        cfg.sqrt_spp, cfg.width, cfg.height, keys0)

    policy = _pallas_policy(scene, scene.arrays, cfg)
    shade = _make_shade(scene, cfg, policy)
    kinds = scene.static.mat_kinds
    _, n_uniforms = _slot_layout(kinds, scene.static.has_lights,
                                 scene.static.mix_depth)
    arrays = scene.arrays
    T0 = Vec3.ones((n,), cfg.dtype)
    L0 = Vec3.zeros((n,), cfg.dtype)
    alive0 = jnp.ones((n,), bool)

    def scan_reps(body):
        @jax.jit
        def run(o, d, t, keys):
            def step(carry, b):
                return body(carry, b, keys), None
            out, _ = jax.lax.scan(step, (o, d, t),
                                  jnp.arange(REPS, dtype=jnp.int32))
            return out[0].x + out[1].x + out[2]
        return run

    # -- rng: the per-bounce uniform draw --------------------------------
    def rng_body(carry, b, keys):
        o, d, t = carry
        kb = prng.fold_all(keys, b)
        u = prng.ray_uniforms(prng.fold_all(kb, prng.SCATTER), n_uniforms)
        return o + Vec3(u[0], u[1 % n_uniforms], u[2 % n_uniforms]) * 1e-20, d, t

    # -- intersect: full scene hit ----------------------------------------
    def isect_body(carry, b, keys):
        o, d, t = carry
        kb = prng.fold_all(keys, b)
        hit = scenelib.intersect(scene, arrays, Ray(origin=o, direction=d,
                                                    time=t),
                                 cfg.t_min, cfg.t_max, kb, active=alive0,
                                 **policy)
        return o + Vec3(hit.t, hit.u, hit.v) * 1e-20, d, t

    # -- shade: one full bounce body --------------------------------------
    def shade_body(carry, b, keys):
        o, d, t = carry
        kb = prng.fold_all(keys, b)
        o2, d2, T, L, alive = shade(arrays, Ray(origin=o, direction=d, time=t),
                                    T0, L0, alive0, kb)
        return o + (o2 + L) * 1e-20, Vec3.where(alive, d2, d), t

    # -- raygen: fresh camera rays ---------------------------------------
    def raygen_body(carry, b, keys):
        o, d, t = carry
        kb = prng.fold_all(keys, b)
        r = generate_rays(camera, px, py,
                          (b % cfg.sqrt_spp).astype(cfg.dtype) + px * 0,
                          (b // cfg.sqrt_spp).astype(cfg.dtype) + py * 0,
                          cfg.sqrt_spp, cfg.width, cfg.height, kb)
        return o + r.origin * 1e-20, Vec3.where(b > 0, r.direction, d), t

    stages = {}
    args = (ray.origin, ray.direction, ray.time, keys0)
    for name, body in [("rng", rng_body), ("intersect", isect_body),
                       ("shade", shade_body), ("raygen", raygen_body)]:
        run = scan_reps(body)
        s, comp = timed(run, *args)
        fl, by = cost(lambda o, d, t, k, _b=body: scan_reps(_b)(o, d, t, k),
                      *args)
        stages[name] = {
            "us_per_iter": round(s * 1e6, 1),
            "ns_per_lane_iter": round(s / n * 1e9, 3),
            "flops_per_lane": round(fl / n, 1),
            "bytes_per_lane": round(by / n, 1),
        }
        print(f"{name}: {stages[name]} [compile {comp:.0f}s]", flush=True)

    # -- full frame body time for the residual ---------------------------
    from raysnail_tpu.integrator import radiance_regen_shuffle

    @jax.jit
    def frame(arrays, cam, key):
        return radiance_regen_shuffle(scene, arrays, cfg, cam, key,
                                      cfg.effective_samples)

    key = prng.key(7)
    t0 = time.time()
    sums, trips = frame(arrays, camera, key)
    trips = int(trips)
    float(sums.x.sum())
    comp = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        sums, _ = frame(arrays, camera, key)
        float(sums.x.sum())
        best = min(best, time.time() - t0)
    body_us = best / trips * 1e6
    spp = cfg.effective_samples
    out = {
        "frame_steady_s": round(best, 4),
        "while_trips": trips,
        "body_us_per_iter": round(body_us, 1),
        "mrays_primary": round(n * spp / best / 1e6, 1),
        "stages_us": {k: v["us_per_iter"] for k, v in stages.items()},
        "stages": stages,
    }
    sh = stages["shade"]["us_per_iter"]
    is_ = stages["intersect"]["us_per_iter"]
    rg = stages["rng"]["us_per_iter"]
    ry = stages["raygen"]["us_per_iter"]
    out["derived_us"] = {
        "shading_math": round(sh - is_ - rg, 1),
        "bookkeeping_residual": round(body_us - sh - ry, 1),
    }
    out["shares_pct"] = {
        "intersect": round(is_ / body_us * 100, 1),
        "rng": round(rg / body_us * 100, 1),
        "shading_math": round((sh - is_ - rg) / body_us * 100, 1),
        "raygen": round(ry / body_us * 100, 1),
        "bookkeeping_residual": round((body_us - sh - ry) / body_us * 100, 1),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
