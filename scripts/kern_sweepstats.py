#!/usr/bin/env python
"""Split the v4 traversal kernel's cost: sweeps-per-packet distribution and
attr-selection share, on coherent (tile-order) vs shuffled (bounce-proxy)
rays, for the 9.6k-tri and 200k-tri meshes. Run with
RAYSNAIL_BVH_NOATTR=1 to probe the no-attr variant (a0 = sweep count)."""

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

REPS = 16


def bench(fn, *args, label="", n=1):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    float(jnp.asarray(fn(*args)[0]).sum())
    comp = time.time() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        float(jnp.asarray(fn(*args)[0]).sum())
        best = min(best, time.time() - t0)
    best /= REPS
    print(f"{label}: {best*1e3:7.2f} ms ({n/best/1e6:7.2f} Mrays/s)"
          f" [compile {comp:.0f}s]", flush=True)
    return best


def main():
    noattr = os.environ.get("RAYSNAIL_BVH_NOATTR") == "1"
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from mesh_profile import build_mesh_scene
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.camera import generate_rays
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import _tile_grid
    from raysnail_tpu.ops import bvh_pallas

    cfg = RenderConfig(width=320, height=200, samples=16, max_depth=6)
    scene, cam = build_mesh_scene(cfg)
    g = scene.arrays.triangles
    global KIND
    KIND = ("tri_mxu" if g.pk_tri.shape[2] == bvh_pallas.MXU_LANES else "tri")
    print("solver kind:", KIND, flush=True)
    px, py, _ = _tile_grid(cfg)
    px = jnp.asarray(px, cfg.dtype); py = jnp.asarray(py, cfg.dtype)
    keys = prng.fast_streams(prng.key(7), (py * cfg.width + px).astype(jnp.int32))
    ray = generate_rays(cam, px, py, jnp.zeros_like(px), jnp.zeros_like(py),
                        4, cfg.width, cfg.height, keys)
    n = px.shape[0]
    npk = n + ((-n) % bvh_pallas.TILE_R)
    pd = lambda a: jnp.pad(a, (0, npk - n))

    rng = np.random.default_rng(3)
    perm = jnp.asarray(rng.permutation(n))

    def fields(shuffle, diffuse):
        ox, oy, oz = ray.origin.x, ray.origin.y, ray.origin.z
        dx, dy, dz = ray.direction.x, ray.direction.y, ray.direction.z
        if diffuse:
            # bounce-ray proxy: origins on the ground plane under each pixel,
            # random cosine-ish directions (fully incoherent per packet)
            r2 = np.random.default_rng(5)
            sph = r2.normal(size=(3, n)).astype(np.float32)
            sph /= np.linalg.norm(sph, axis=0, keepdims=True)
            sph[1] = np.abs(sph[1])
            dx, dy, dz = (jnp.asarray(c) for c in sph)
            oy = jnp.zeros_like(oy) - 1.0
        if shuffle:
            t = lambda a: jnp.take(a, perm)
            ox, oy, oz, dx, dy, dz = map(t, (ox, oy, oz, dx, dy, dz))
        return (pd(ox), pd(oy), pd(oz)), (pd(dx), pd(dy), pd(dz))

    @jax.jit
    def kern(o3, d3):
        def body(c, _):
            t, a0, *_ = bvh_pallas.bvh_traverse(
                o3, (d3[0] + c * 0.0, d3[1], d3[2]),
                jnp.full((npk,), 1e30, jnp.float32),
                g.pk_bb, g.pk_links, g.pk_tri,
                jnp.float32(1e-3), jnp.float32(1e30), kind=KIND)
            return c + t.sum() * 1e-30, (t, a0)
        c, (t, a0) = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return c + 0 * t[0, 0], a0[0]

    # honest bounce-1 geometry: origins at the PRIMARY hit points (tile
    # order), random upward directions — then octant-sorted variants that
    # reuse the SAME compiled kernel (host-side permutations) to measure
    # the packet-coherence headroom of ray sorting at zero compile cost
    (o3c, d3c) = fields(False, False)
    t_prim = np.asarray(jax.jit(lambda o, d: bvh_pallas.bvh_traverse(
        o, d, jnp.full((npk,), 1e30, jnp.float32), g.pk_bb, g.pk_links,
        g.pk_tri, jnp.float32(1e-3), jnp.float32(1e30), kind=KIND)[0]
    )(o3c, d3c))[:n]
    t_hit = np.clip(t_prim, 0.0, 12.0).astype(np.float32)
    o_np = np.stack([np.asarray(a)[:n] for a in o3c])
    d_np = np.stack([np.asarray(a)[:n] for a in d3c])
    hp = o_np + d_np * t_hit[None, :] * 0.999
    r3_ = np.random.default_rng(9)
    nd = r3_.normal(size=(3, n)).astype(np.float32)
    nd /= np.linalg.norm(nd, axis=0, keepdims=True)
    nd[1] = np.abs(nd[1])  # upward-ish

    def bounce_fields(order=None):
        h, dd = (hp, nd) if order is None else (hp[:, order], nd[:, order])
        return (tuple(pd(jnp.asarray(h[i])) for i in range(3)),
                tuple(pd(jnp.asarray(dd[i])) for i in range(3)))

    octant = ((nd[0] < 0).astype(np.int64) * 4 + (nd[1] < 0) * 2
              + (nd[2] < 0))
    lane = np.arange(n)
    sort_g = np.argsort(octant, kind="stable")
    sort_1k = np.argsort((lane // 1024) * 8 + octant, kind="stable")
    sort_4k = np.argsort((lane // 4096) * 8 + octant, kind="stable")

    tag = "NOATTR" if noattr else "full"
    for label, (o3, d3) in [
        ("coherent-primary", fields(False, False)),
        ("shuffled-primary", fields(True, False)),
        ("diffuse-bounce  ", fields(False, True)),
        ("bounce1 tile    ", bounce_fields()),
        ("bounce1 oct-glob", bounce_fields(sort_g)),
        ("bounce1 oct-1k  ", bounce_fields(sort_1k)),
        ("bounce1 oct-4k  ", bounce_fields(sort_4k)),
    ]:
        best = bench(lambda o, d: kern(o, d), o3, d3,
                     label=f"{tag} {label}", n=n)
        if noattr:
            _, a0 = kern(o3, d3)
            a0 = np.asarray(a0)[:n]
            print(f"    sweeps/packet: mean {a0.mean():6.1f} "
                  f"p50 {np.percentile(a0, 50):5.0f} "
                  f"p95 {np.percentile(a0, 95):5.0f} max {a0.max():5.0f} "
                  f"(blocks total {g.pk_tri.shape[0]})", flush=True)


if __name__ == "__main__":
    main()
