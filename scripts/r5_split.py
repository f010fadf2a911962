#!/usr/bin/env python
"""Round-5 walk-vs-sweep-vs-attr split for the v4 traversal kernel, on BOTH
mesh configs (VERDICT r4 item 1 wants this published in BASELINE.md).

Runs the kernel-only traversal on coherent primaries and on honest bounce-1
rays (origins at primary hit points, upward-ish random directions), for the
9.6k-tri knot and the 200k-tri knot. The variant is selected by env:
  (none)               full kernel
  RAYSNAIL_BVH_NOATTR  sweep without attr extraction (a0 = sweeps/packet)
  RAYSNAIL_BVH_NOSWEEP walk + leaf buffering only (no primitive solves)
so  full - NOATTR = attr cost, NOATTR - NOSWEEP = solve cost,
    NOSWEEP = node walk + admission + (DMA when streaming).

Usage: python scripts/r5_split.py {small|big}
Driver: python scripts/r5_split.py sweep   (runs all 6 in subprocesses)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(size: str):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from raysnail_tpu import ir
    from raysnail_tpu.camera import build_camera, generate_rays
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.ops import bvh_pallas
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import _tile_grid
    from raysnail_tpu.scene import SceneBuilder
    from raysnail_tpu.scenes.meshes import torus_knot

    REPS = 16
    cfg = RenderConfig(width=320, height=200, samples=16, max_depth=6)
    if size == "small":
        v, f, n = torus_knot(n_seg=200, n_ring=24)
    else:
        v, f, n = torus_knot(n_seg=1600, n_ring=64)
    b = SceneBuilder()
    b.add(ir.Mesh(vertices=v, indices=f, normals=n,
                  material=ir.DiffuseMetal(400.0,
                                           ir.Constant((0.8, 0.6, 0.3)))))
    scene = b.compile()
    cam = build_camera(look_from=(0, 1.5, 4), look_at=(0, 0, 0), fov=45,
                       width=cfg.width, height=cfg.height)
    g = scene.arrays.triangles
    kind = ("tri_mxu" if g.pk_tri.shape[2] == bvh_pallas.MXU_LANES else "tri")
    n_nodes = g.pk_bb.shape[1]
    print(f"[{size}] tris~{f.shape[0]} nodes={n_nodes} "
          f"octants={g.pk_bb.shape[0]} kind={kind} "
          f"prim_mb={g.pk_tri.size * 4 / 1e6:.1f}", flush=True)

    px, py, _ = _tile_grid(cfg)
    px = jnp.asarray(px, cfg.dtype)
    py = jnp.asarray(py, cfg.dtype)
    keys = prng.fast_streams(prng.key(7),
                             (py * cfg.width + px).astype(jnp.int32))
    ray = generate_rays(cam, px, py, jnp.zeros_like(px), jnp.zeros_like(py),
                        4, cfg.width, cfg.height, keys)
    n_r = px.shape[0]
    npk = n_r + ((-n_r) % bvh_pallas.TILE_R)
    pd = lambda a: jnp.pad(jnp.asarray(a, jnp.float32), (0, npk - n_r))

    o3c = (pd(ray.origin.x), pd(ray.origin.y), pd(ray.origin.z))
    d3c = (pd(ray.direction.x), pd(ray.direction.y), pd(ray.direction.z))

    @jax.jit
    def kern(o3, d3):
        def body(c, _):
            t, a0, *_ = bvh_pallas.bvh_traverse(
                o3, (d3[0] + c * 0.0, d3[1], d3[2]),
                jnp.full((npk,), 1e30, jnp.float32),
                g.pk_bb, g.pk_links, g.pk_tri,
                jnp.float32(1e-3), jnp.float32(1e30), kind=kind)
            return c + t.sum() * 1e-30, (t, a0)
        c, (t, a0) = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c + 0 * t[0, 0], t[0], a0[0]

    def bench(o3, d3, label):
        t0 = time.time()
        float(jnp.asarray(kern(o3, d3)[0]))
        comp = time.time() - t0
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            float(jnp.asarray(kern(o3, d3)[0]))
            best = min(best, time.time() - t0)
        best /= REPS
        print(f"[{size}] {label}: {best * 1e3:8.2f} ms "
              f"({n_r / best / 1e6:7.2f} Mrays/s) [compile {comp:.0f}s]",
              flush=True)
        return best

    # primary pass to place bounce origins
    tp = np.asarray(kern(o3c, d3c)[1])[:n_r]
    t_hit = np.clip(tp, 0.0, 12.0).astype(np.float32)
    o_np = np.stack([np.asarray(a)[:n_r] for a in o3c])
    d_np = np.stack([np.asarray(a)[:n_r] for a in d3c])
    hp = o_np + d_np * t_hit[None, :] * 0.999
    r3_ = np.random.default_rng(9)
    nd = r3_.normal(size=(3, n_r)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=0, keepdims=True)
    nd[1] = np.abs(nd[1])
    o3b = tuple(pd(hp[i]) for i in range(3))
    d3b = tuple(pd(nd[i]) for i in range(3))

    variant = ("NOSWEEP" if os.environ.get("RAYSNAIL_BVH_NOSWEEP") == "1"
               else "NOATTR" if os.environ.get("RAYSNAIL_BVH_NOATTR") == "1"
               else "full")
    res = {}
    res["primary"] = bench(o3c, d3c, f"{variant} coherent-primary")
    res["bounce1"] = bench(o3b, d3b, f"{variant} bounce1-tile ")
    if variant == "NOATTR":
        a0 = np.asarray(kern(o3b, d3b)[2])[:n_r]
        pk_sweeps = a0.reshape(-1, 128).max(axis=1)
        print(f"[{size}] bounce1 sweeps/packet: mean {pk_sweeps.mean():.1f} "
              f"p50 {np.percentile(pk_sweeps, 50):.0f} "
              f"p90 {np.percentile(pk_sweeps, 90):.0f} "
              f"max {pk_sweeps.max():.0f} of {g.pk_tri.shape[0]} blocks",
              flush=True)
        a0p = np.asarray(kern(o3c, d3c)[2])[:n_r]
        pkp = a0p.reshape(-1, 128).max(axis=1)
        print(f"[{size}] primary sweeps/packet: mean {pkp.mean():.1f} "
              f"p90 {np.percentile(pkp, 90):.0f}", flush=True)
    print(json.dumps({"size": size, "variant": variant,
                      **{k: round(v * 1e3, 2) for k, v in res.items()}}),
          flush=True)


def sweep():
    for size in ("small", "big"):
        for env in ({}, {"RAYSNAIL_BVH_NOATTR": "1"},
                    {"RAYSNAIL_BVH_NOSWEEP": "1"}):
            e = dict(os.environ)
            e.update(env)
            subprocess.run([sys.executable, os.path.abspath(__file__), size],
                           env=e, timeout=3000)


if __name__ == "__main__":
    if sys.argv[1] == "sweep":
        sweep()
    else:
        run_one(sys.argv[1])
