#!/usr/bin/env python
"""Two-level-walk A/B (VERDICT r4 item 1): kernel-only traversal time on
coherent primaries and honest bounce-1 rays, for the 9.6k and 200k meshes,
with two_level False vs True IN THE SAME PROCESS (same tunnel session, same
ray sets, explicit static arg — no env-at-trace footguns).

Usage: python scripts/r5_2lvl.py [small] [big]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
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


def run_one(size: str):
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
    n_real = int(np.sum(np.asarray(g.pk_crange)[0, :, 1]
                        > np.asarray(g.pk_crange)[0, :, 0]))
    print(f"[{size}] tris~{f.shape[0]} nodes={g.pk_bb.shape[1]} "
          f"octants={g.pk_bb.shape[0]} kind={kind} coarse={n_real}",
          flush=True)

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

    import functools

    @functools.partial(jax.jit, static_argnames=("tl",))
    def kern(o3, d3, tl):
        def body(c, _):
            t, *_ = bvh_pallas.bvh_traverse(
                o3, (d3[0] + c * 0.0, d3[1], d3[2]),
                jnp.full((npk,), 1e30, jnp.float32),
                g.pk_bb, g.pk_links, g.pk_tri,
                jnp.float32(1e-3), jnp.float32(1e30), kind=kind,
                cbb=g.pk_cbb, crange=g.pk_crange, two_level=tl)
            return c + t.sum() * 1e-30, t
        c, t = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c + 0 * t[0, 0], t[0]

    def bench(o3, d3, tl, label):
        t0 = time.time()
        float(jnp.asarray(kern(o3, d3, tl)[0]))
        comp = time.time() - t0
        best = float("inf")
        for _ in range(4):
            t0 = time.time()
            float(jnp.asarray(kern(o3, d3, tl)[0]))
            best = min(best, time.time() - t0)
        best /= REPS
        print(f"[{size}] 2lvl={int(tl)} {label}: {best * 1e3:8.2f} ms "
              f"({n_r / best / 1e6:7.2f} Mrays/s) [compile {comp:.0f}s]",
              flush=True)
        return best

    # bounce-1 geometry from a primary pass
    tp = np.asarray(kern(o3c, d3c, False)[1])[:n_r]
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

    only_1lvl = os.environ.get("RAYSNAIL_AB_1LVL_ONLY") == "1"
    if not only_1lvl:
        # correctness on-device: identical hit distances both ways
        ta = np.asarray(kern(o3b, d3b, False)[1])
        tb = np.asarray(kern(o3b, d3b, True)[1])
        print(f"[{size}] two-level EXACT match: {np.array_equal(ta, tb)}",
              flush=True)

    for tl in ((False,) if only_1lvl else (False, True)):
        bench(o3c, d3c, tl, "coherent-primary")
        bench(o3b, d3b, tl, "bounce1-tile ")


if __name__ == "__main__":
    for size in (sys.argv[1:] or ["small", "big"]):
        run_one(size)
