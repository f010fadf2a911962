"""Benchmark driver: canonical workload on the available accelerator.

Workload (BASELINE.md): sdl/example.sdl at 800x500, --samples 65 => 64
effective spp, depth 8 — the reference's README invocation. Metric:
Mrays/s/chip counting PRIMARY rays (pixels x effective spp) per wall-clock
second of steady-state rendering (compile time excluded; the compile is
reported to stderr).

vs_baseline: the reference publishes no numbers (BASELINE.md) and this image
has no Rust toolchain to measure it, so the baseline is pinned to an
ESTIMATE of the reference on this machine's 2 vCPUs: ~0.5 Mrays/s primary
(row-threaded f64 tracer at num_cpus+1 threads on comparable scenes).
Refine when a measured number exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env:
  RAYSNAIL_BENCH_CPU=1     force the CPU backend (debug)
  RAYSNAIL_BENCH_SMALL=1   tiny config (smoke-testing the harness)
"""

from __future__ import annotations

import json
import os
import sys
import time

REF_BASELINE_MRAYS = 0.5  # estimated reference CPU Mrays/s on this host


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("RAYSNAIL_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import _full_grid, make_sample_step
    from raysnail_tpu.sdl import build_scene

    small = os.environ.get("RAYSNAIL_BENCH_SMALL") == "1"
    cfg = RenderConfig(width=200 if small else 800,
                       height=125 if small else 500,
                       samples=4 if small else 65,
                       max_depth=8)
    repo = os.path.dirname(os.path.abspath(__file__))
    scene, camera = build_scene(os.path.join(repo, "sdl", "example.sdl"), cfg)
    dev = jax.devices()[0]
    log(f"bench: device={dev} {cfg.width}x{cfg.height} spp={cfg.effective_samples} depth={cfg.max_depth}")

    step = make_sample_step(scene, cfg)
    px, py = _full_grid(cfg)
    px = jnp.asarray(px, cfg.dtype)
    py = jnp.asarray(py, cfg.dtype)
    key = prng.key(7)

    spp = cfg.effective_samples
    # one stratification cell per dispatch: pixels*1 rays each
    t0 = time.time()
    out = step(scene.arrays, camera, key, jnp.arange(1, dtype=jnp.int32), px, py)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    log(f"bench: first dispatch (compile+run) {compile_s:.1f}s")

    t0 = time.time()
    accum = None
    for start in range(1, spp):
        ids = jnp.arange(start, start + 1, dtype=jnp.int32)
        sums = step(scene.arrays, camera, key, ids, px, py)
        accum = sums if accum is None else accum + sums
    jax.block_until_ready(accum)
    dt = time.time() - t0
    n_cells = spp - 1
    primary = cfg.width * cfg.height * n_cells
    mrays = primary / dt / 1e6
    log(f"bench: {n_cells} cells in {dt:.2f}s -> {mrays:.3f} Mprimary-rays/s "
        f"({mrays * cfg.max_depth:.2f} M ray-segments/s at depth {cfg.max_depth})")

    print(json.dumps({
        "metric": "example.sdl 800x500@64spp fwd primary rays per second per chip",
        "value": round(mrays, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / REF_BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
