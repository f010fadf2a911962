#!/usr/bin/env python
"""PINNED-CODE drift control workload — DO NOT EDIT (VERDICT r4 item 6).

The axon tunnel's device throughput drifts 1.5-2x between grant sessions
(BASELINE.md methodology), which makes raw cross-round comparisons soft.
This file is a FROZEN, self-contained workload that bench.py --all runs in
every sweep as the `control` row: because this code never changes, the
control reading measures only the session's conditions (device grant,
dispatch latency, runtime version), so every cross-round ratio can be
normalized as (config_rN / control_rN) vs (config_rM / control_rM).

The workload is shaped like the canonical frame (not equal to it): 400k
lanes through a lax.while_loop with a fixed 248-trip budget, a 16-sphere
dense intersection sweep, Lambertian-style shading arithmetic, an fmix32
counter RNG, and a (N, 16) one-hot cell-table accumulate — the same mix of
VPU compute, HBM carry traffic, and loop scheduling the real integrator
pays. It imports nothing from raysnail_tpu, so package edits cannot move it.

Frozen 2026-08-21 (round 5). Nominal first reading is recorded by the sweep
that lands this file; all later sessions report raw value only.
"""

from __future__ import annotations

import time

N_LANES = 400_000
TRIPS = 248
N_SPH = 16
C = 16
REPS = 3


def _build():
    import jax
    import jax.numpy as jnp

    def fmix(x):
        x = jnp.uint32(x) if not hasattr(x, "dtype") else x.astype(jnp.uint32)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        return x

    def unif(ctr, lane):
        h = fmix(ctr * jnp.uint32(0x9E3779B9) ^ lane)
        return (h >> 8).astype(jnp.float32) * (1.0 / (1 << 24))

    # fixed sphere field
    import numpy as np
    rng = np.random.default_rng(1234)
    cx, cy, cz = (jnp.asarray(rng.uniform(-4, 4, N_SPH), jnp.float32)
                  for _ in range(3))
    rad2 = jnp.asarray(rng.uniform(0.3, 1.0, N_SPH) ** 2, jnp.float32)

    lanes = jnp.arange(N_LANES, dtype=jnp.uint32)
    cols = jnp.arange(C, dtype=jnp.int32)

    @jax.jit
    def run(seed):
        ox = unif(seed, lanes) * 8.0 - 4.0
        oy = unif(seed + 1, lanes) * 8.0 - 4.0
        oz = jnp.full((N_LANES,), -8.0, jnp.float32)
        dx = unif(seed + 2, lanes) - 0.5
        dy = unif(seed + 3, lanes) - 0.5
        dz = jnp.ones((N_LANES,), jnp.float32)
        inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv, dy * inv, dz * inv
        T = jnp.ones((N_LANES,), jnp.float32)
        tbl = jnp.zeros((N_LANES, C), jnp.float32)
        k = jnp.zeros((N_LANES,), jnp.int32)

        def cond(st):
            return st[0] < TRIPS

        def body(st):
            it, ox, oy, oz, dx, dy, dz, T, tbl, k = st
            # dense sphere sweep: (N, S) via broadcast
            lx = ox[:, None] - cx[None, :]
            ly = oy[:, None] - cy[None, :]
            lz = oz[:, None] - cz[None, :]
            hb = dx[:, None] * lx + dy[:, None] * ly + dz[:, None] * lz
            cc = lx * lx + ly * ly + lz * lz - rad2[None, :]
            delta = hb * hb - cc
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            t1 = -hb - sq
            t = jnp.where((delta > 0) & (t1 > 1e-3), t1, 1e30)
            tmin = jnp.min(t, axis=1)
            hit = tmin < 1e29
            # shading-ish arithmetic + RNG
            u1 = unif(it * 7 + 11, lanes)
            u2 = unif(it * 7 + 12, lanes)
            phi = 6.2831853 * u1
            ct = jnp.sqrt(u2)
            st_ = jnp.sqrt(1.0 - u2)
            ndx = st_ * jnp.cos(phi)
            ndy = st_ * jnp.sin(phi)
            ndz = ct
            px = ox + dx * jnp.where(hit, tmin, 1.0)
            py = oy + dy * jnp.where(hit, tmin, 1.0)
            pz = oz + dz * jnp.where(hit, tmin, 1.0)
            L_add = jnp.where(hit, T * 0.2, T * 0.7)
            # one-hot cell-table accumulate (the canonical loop's bookkeeping)
            oh = (k[:, None] == cols[None, :]).astype(jnp.float32)
            tbl = tbl + oh * L_add[:, None]
            done = u1 < 0.28
            k = jnp.where(done, (k + 1) % C, k)
            T = jnp.where(done, 1.0, T * 0.8)
            ox = jnp.where(hit, px, ox)
            oy = jnp.where(hit, py, oy)
            oz = jnp.where(hit, pz, oz)
            dx = jnp.where(hit, ndx, dx)
            dy = jnp.where(hit, ndy, dy)
            dz = jnp.where(hit, ndz, dz)
            return it + 1, ox, oy, oz, dx, dy, dz, T, tbl, k

        out = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), ox, oy, oz, dx, dy, dz, T, tbl, k))
        return out[8].sum()

    return run


def measure() -> dict:
    """-> {"control_units": Mlane-iters/s, "steady_s", "compile_s"}."""
    run = _build()
    t0 = time.time()
    v = float(run(7))
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        float(run(7))
        best = min(best, time.time() - t0)
    return {
        "control_units": round(N_LANES * TRIPS / best / 1e6, 2),
        "steady_s": round(best, 3),
        "compile_s": round(compile_s, 1),
        "checksum": round(v, 1),
    }


if __name__ == "__main__":
    import json
    print(json.dumps(measure()))
