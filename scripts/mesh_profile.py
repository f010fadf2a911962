#!/usr/bin/env python
"""v4 kernel on the real chip: correctness vs the CPU golden anchor, then
kernel-only and full-frame timings for the mesh and rtow_13_1 configs."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_mesh_scene(cfg):
    from raysnail_tpu import ir
    from raysnail_tpu.camera import build_camera
    from raysnail_tpu.scene import SceneBuilder
    from raysnail_tpu.scenes.meshes import torus_knot

    v, f, n = torus_knot(n_seg=200, n_ring=24)
    b = SceneBuilder()
    b.add(ir.Mesh(vertices=v, indices=f, normals=n,
                  material=ir.DiffuseMetal(400.0, ir.Constant((0.8, 0.6, 0.3)))))
    b.add(ir.Sphere((0, -1001.3, 0), 1000.0, ir.Lambertian(ir.Constant((0.4, 0.4, 0.45)))))
    b.add(ir.Sphere((4, 6, 3), 1.5, ir.DiffuseLight(ir.Constant((1.0, 0.95, 0.9)), 8.0)),
          light=True)
    b.set_background((0.05, 0.05, 0.08), (0.1, 0.12, 0.2))
    cam = build_camera(look_from=(0, 1.5, 4), look_at=(0, 0, 0), fov=45,
                       width=cfg.width, height=cfg.height)
    return b.compile(), cam


def time_frame(scene, cam, cfg, label):
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import _tile_grid, _sample_chunks, make_sample_step

    step = make_sample_step(scene, cfg)
    px, py, _ = _tile_grid(cfg)
    px = jnp.asarray(px, cfg.dtype); py = jnp.asarray(py, cfg.dtype)
    key = prng.key(7)
    spp = cfg.effective_samples
    k = _sample_chunks(cfg, cfg.width * cfg.height)
    t0 = time.time()
    out = step(scene.arrays, cam, key, jnp.arange(k, dtype=jnp.int32), px, py)
    float(out.x.sum())
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        accum = None
        for start in range(0, spp, k):
            ids = jnp.arange(start, start + k, dtype=jnp.int32)
            s = step(scene.arrays, cam, key, ids, px, py)
            accum = s if accum is None else accum + s
        float(accum.x.sum())
        best = min(best, time.time() - t0)
    mrays = cfg.width * cfg.height * spp / best / 1e6
    print(f"{label}: {mrays:.3f} Mrays/s (steady {best:.2f}s, compile {compile_s:.0f}s)",
          flush=True)
    return mrays


def main():
    from raysnail_tpu.config import RenderConfig

    print("device:", jax.devices()[0], flush=True)

    # correctness: the golden mesh anchor config on TPU vs committed CPU stats
    from raysnail_tpu.utils import golden
    from raysnail_tpu.render import render

    g = golden.load_golden()
    scene_s, cam_s, cfg_s, seed = golden.golden_configs()["mesh"]()
    t0 = time.time()
    img = render(scene_s, cam_s, cfg_s, seed=seed)
    stats = golden.anchor_stats(img)
    d = np.abs(stats["thumb"] - g["mesh"]["thumb"]).max()
    print(f"TPU-vs-CPU mesh anchor: thumb maxdiff {d:.4f} "
          f"mean {stats['mean']} vs {g['mesh']['mean']} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # kernel-only microbench on primary rays
    cfg = RenderConfig(width=320, height=200, samples=16, max_depth=6)
    scene, cam = build_mesh_scene(cfg)
    ntri = int(scene.arrays.triangles.mat_id.shape[0])
    print(f"tris (padded leaf4): {ntri}", flush=True)

    from raysnail_tpu.camera import generate_rays
    from raysnail_tpu.ops import bvh_pallas
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import _tile_grid

    px, py, _ = _tile_grid(cfg)
    px = jnp.asarray(px, cfg.dtype); py = jnp.asarray(py, cfg.dtype)
    keys = prng.fast_streams(prng.key(7), (py * cfg.width + px).astype(jnp.int32))
    ray = generate_rays(cam, px, py, jnp.zeros_like(px), jnp.zeros_like(py),
                        4, cfg.width, cfg.height, keys)
    gtri = scene.arrays.triangles
    n = px.shape[0]
    npk = n + ((-n) % bvh_pallas.TILE_R)
    pd = lambda a: jnp.pad(a, (0, npk - n))
    # amortize the ~25-45ms axon dispatch round-trip over 32 kernel calls
    REPS_IN = 32

    @jax.jit
    def kern_only(gtri, ray):
        def body(c, _):
            t, *_rest = bvh_pallas.bvh_traverse(
                (pd(ray.origin.x), pd(ray.origin.y), pd(ray.origin.z)),
                (pd(ray.direction.x + c * 0.0), pd(ray.direction.y),
                 pd(ray.direction.z)),
                jnp.full((npk,), 1e30, jnp.float32),
                gtri.pk_bb, gtri.pk_links, gtri.pk_tri,
                jnp.float32(1e-3), jnp.float32(1e30), kind="tri")
            return c + t.sum() * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS_IN)
        return c

    t0 = time.time()
    float(kern_only(gtri, ray))
    print(f"kernel-only compile: {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        float(kern_only(gtri, ray))
        best = min(best, time.time() - t0)
    best /= REPS_IN
    print(f"kernel-only primary (tile order): {n/best/1e6:.2f} Mrays/s "
          f"({best*1e3:.1f} ms for {n} rays)", flush=True)

    time_frame(scene, cam, cfg, "mesh+arealight full frame")

    # rtow_13_1 (sphere BVH route)
    from raysnail_tpu.scenes import book1
    cfg1 = RenderConfig(width=400, height=225, samples=16, max_depth=8)
    time_frame(book1.balls_scene(7).compile(),
               book1.balls_camera(cfg1.width, cfg1.height), cfg1, "rtow_13_1")


if __name__ == "__main__":
    main()
