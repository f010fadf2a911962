#!/usr/bin/env python
"""Pin down per-decision latency in the traversal loop: walk-only cost per
node step, cond-sweep cost, and a (128,8)-wide walk variant — all amortized
over 32 in-jit repetitions so the axon dispatch round-trip vanishes."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PACKET = 128
GROUP = 8
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
    print(f"{label}: {best*1e3:7.2f} ms/call ({n/best/1e6:7.2f} Mrays/s) "
          f"[compile {comp:.0f}s]", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from mesh_profile import build_mesh_scene
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.camera import generate_rays
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import _tile_grid

    cfg = RenderConfig(width=320, height=200, samples=16, max_depth=6)
    scene, cam = build_mesh_scene(cfg)
    g = scene.arrays.triangles
    px, py, _ = _tile_grid(cfg)
    px = jnp.asarray(px, cfg.dtype); py = jnp.asarray(py, cfg.dtype)
    keys = prng.fast_streams(prng.key(7), (py * cfg.width + px).astype(jnp.int32))
    ray = generate_rays(cam, px, py, jnp.zeros_like(px), jnp.zeros_like(py),
                        4, cfg.width, cfg.height, keys)
    n = px.shape[0]
    npk = n + ((-n) % (GROUP * PACKET))
    pd = lambda a: jnp.pad(a, (0, npk - n))
    fields = [pd(a) for a in (ray.origin.x, ray.origin.y, ray.origin.z,
                              ray.direction.x, ray.direction.y, ray.direction.z)]
    fields += [jnp.full(npk, 1e30, jnp.float32), jnp.zeros(npk, jnp.float32)]
    rays = jnp.swapaxes(jnp.stack(fields).reshape(8, -1, PACKET), 0, 1)
    pk_bb = np.asarray(g.pk_bb)[0]        # octant-0 node order, (M, 8)
    pk_links = np.asarray(g.pk_links)[0]  # (M, 4)
    m_nodes = pk_bb.shape[0]
    print(f"nodes={m_nodes} blocks={g.pk_tri.shape[0]} rays={n}", flush=True)

    blk_spec = pl.BlockSpec((GROUP, 8, PACKET), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda arr: pl.BlockSpec(arr.shape, lambda i, _nd=arr.ndim: (0,) * _nd,
                                    memory_space=pltpu.SMEM)
    common = dict(
        grid=(npk // (GROUP * PACKET),),
        out_specs=pl.BlockSpec((GROUP, 8, PACKET), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npk // PACKET, 8, PACKET), jnp.float32),
    )

    def make(kernel):
        call = pl.pallas_call(
            kernel, in_specs=[blk_spec, smem(pk_bb), smem(pk_links)],
            **common)

        @jax.jit
        def run(rays, bb, links):
            def body(c, _):
                o = call(rays, bb, links)
                return c + o[0, 0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
            return c
        return run

    # A: narrow walk (128-ray packets), scalar any() decision per node
    def walk_narrow(rays, bb, links, out):
        def packet(pidx, acc):
            rows = rays[pl.ds(pidx, 1), :, :].reshape(8, PACKET)
            cols = jnp.transpose(rows, (1, 0))
            o_x, o_y, o_z = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
            d_x, d_y, d_z = cols[:, 3:4], cols[:, 4:5], cols[:, 5:6]
            inv = lambda d: 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                            jnp.where(d < 0, -1e-12, 1e-12), d)
            ivx, ivy, ivz = inv(d_x), inv(d_y), inv(d_z)

            def walk(state):
                node, acc = state
                ax0 = (bb[node, 0] - o_x) * ivx
                ax1 = (bb[node, 3] - o_x) * ivx
                ay0 = (bb[node, 1] - o_y) * ivy
                ay1 = (bb[node, 4] - o_y) * ivy
                az0 = (bb[node, 2] - o_z) * ivz
                az1 = (bb[node, 5] - o_z) * ivz
                near = jnp.maximum(jnp.maximum(jnp.minimum(ax0, ax1),
                                               jnp.minimum(ay0, ay1)),
                                   jnp.minimum(az0, az1))
                far = jnp.minimum(jnp.minimum(jnp.maximum(ax0, ax1),
                                              jnp.maximum(ay0, ay1)),
                                  jnp.maximum(az0, az1))
                admit = (near <= far) & (far >= 1e-3)
                any_hit = jnp.any(admit)
                is_leaf = links[node, 1] > 0
                node = jnp.where(any_hit & (~is_leaf), node + 1, links[node, 2])
                return node, acc + jnp.sum(near) * 1e-20

            _, acc = jax.lax.while_loop(lambda s: s[0] < m_nodes, walk,
                                        (jnp.asarray(0, jnp.int32), acc))
            return acc

        acc = jax.lax.fori_loop(0, GROUP, packet,
                                jnp.zeros((PACKET, 1), jnp.float32))
        acc8 = jnp.concatenate([acc] * 8, axis=1)          # (PACKET, 8)
        out[0:1, :, :] = jnp.transpose(acc8, (1, 0)).reshape(1, 8, PACKET)

    # B: wide walk — one walk for all GROUP*128 rays, vector (128, 8)
    def walk_wide(rays, bb, links, out):
        # rays (GROUP, 8, PACKET): field f of packet p = rays[p, f]
        # -> (128, GROUP) per field via transpose of rays[:, f, :]
        rr = rays[:, :, :]
        o_x = jnp.transpose(rr[:, 0, :], (1, 0))   # (PACKET, GROUP)
        o_y = jnp.transpose(rr[:, 1, :], (1, 0))
        o_z = jnp.transpose(rr[:, 2, :], (1, 0))
        d_x = jnp.transpose(rr[:, 3, :], (1, 0))
        d_y = jnp.transpose(rr[:, 4, :], (1, 0))
        d_z = jnp.transpose(rr[:, 5, :], (1, 0))
        inv = lambda d: 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                        jnp.where(d < 0, -1e-12, 1e-12), d)
        ivx, ivy, ivz = inv(d_x), inv(d_y), inv(d_z)

        def walk(state):
            node, acc = state
            ax0 = (bb[node, 0] - o_x) * ivx
            ax1 = (bb[node, 3] - o_x) * ivx
            ay0 = (bb[node, 1] - o_y) * ivy
            ay1 = (bb[node, 4] - o_y) * ivy
            az0 = (bb[node, 2] - o_z) * ivz
            az1 = (bb[node, 5] - o_z) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(ax0, ax1),
                                           jnp.minimum(ay0, ay1)),
                               jnp.minimum(az0, az1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(ax0, ax1),
                                          jnp.maximum(ay0, ay1)),
                              jnp.maximum(az0, az1))
            admit = (near <= far) & (far >= 1e-3)
            any_hit = jnp.any(admit)
            is_leaf = links[node, 1] > 0
            node = jnp.where(any_hit & (~is_leaf), node + 1, links[node, 2])
            return node, acc + jnp.sum(near) * 1e-20

        _, acc = jax.lax.while_loop(lambda s: s[0] < m_nodes, walk,
                                    (jnp.asarray(0, jnp.int32),
                                     jnp.zeros((PACKET, GROUP), jnp.float32)))
        out[0:1, :, :] = jnp.transpose(acc, (1, 0)).reshape(1, 8, PACKET)

    # C: lane-layout walk (1,128) — the real kernel's slab orientation,
    # cap admission test, flat SMEM indexing — but NO buf store / nbuf
    bb_flat = pk_bb.reshape(-1)
    links_flat = pk_links.reshape(-1)
    smemf = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                     memory_space=pltpu.SMEM)

    def make_flat(kernel, scratch=()):
        call = pl.pallas_call(
            kernel, in_specs=[blk_spec, smemf(bb_flat), smemf(links_flat)],
            scratch_shapes=list(scratch), **common)

        @jax.jit
        def run(rays, bb, links):
            def body(c, _):
                o = call(rays, bb, links)
                return c + o[0, 0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
            return c
        return run

    def lane_prologue(rays, pidx):
        rows = rays[pl.ds(pidx, 1), :, :].reshape(8, PACKET)
        o_xl, o_yl, o_zl = rows[0:1, :], rows[1:2, :], rows[2:3, :]
        d_xl, d_yl, d_zl = rows[3:4, :], rows[4:5, :], rows[5:6, :]
        inv = lambda d: 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                                        jnp.where(d < 0, -1e-12, 1e-12), d)
        ivx, ivy, ivz = inv(d_xl), inv(d_yl), inv(d_zl)

        def slab(x0, y0, z0, x1, y1, z1):
            ax0 = (x0 - o_xl) * ivx
            ax1 = (x1 - o_xl) * ivx
            ay0 = (y0 - o_yl) * ivy
            ay1 = (y1 - o_yl) * ivy
            az0 = (z0 - o_zl) * ivz
            az1 = (z1 - o_zl) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(ax0, ax1),
                                           jnp.minimum(ay0, ay1)),
                               jnp.minimum(az0, az1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(ax0, ax1),
                                          jnp.maximum(ay0, ay1)),
                              jnp.maximum(az0, az1))
            return near, far
        return slab

    def walk_lane(rays, bb, links, out):
        def packet(pidx, acc):
            slab = lane_prologue(rays, pidx)
            btc = jnp.full((1, PACKET), 1e30, jnp.float32)

            def walk(state):
                node, acc = state
                nb = node * 8
                nl = node * 4
                near, far = slab(bb[nb], bb[nb + 1], bb[nb + 2],
                                 bb[nb + 3], bb[nb + 4], bb[nb + 5])
                admit = (near <= far) & (far >= 1e-3) & (near <= btc)
                any_hit = jnp.any(admit)
                is_leaf = links[nl + 1] > 0
                node = jnp.where(any_hit & (~is_leaf), node + 1, links[nl + 2])
                return node, acc + jnp.sum(near) * 1e-20

            _, acc = jax.lax.while_loop(lambda s: s[0] < m_nodes, walk,
                                        (jnp.asarray(0, jnp.int32), acc))
            return acc

        acc = jax.lax.fori_loop(0, GROUP, packet,
                                jnp.zeros((1, PACKET), jnp.float32))
        acc8 = jnp.concatenate([acc] * 8, axis=0)          # (8, PACKET)
        out[0:1, :, :] = acc8.reshape(1, 8, PACKET)

    # D: C + the real kernel's buf store / nbuf / compound while condition
    def walk_lane_buf(rays, bb, links, out, buf):
        def packet(pidx, acc):
            slab = lane_prologue(rays, pidx)
            btc = jnp.full((1, PACKET), 1e30, jnp.float32)

            def walk(state):
                node, nbuf, acc = state
                nb = node * 8
                nl = node * 4
                near, far = slab(bb[nb], bb[nb + 1], bb[nb + 2],
                                 bb[nb + 3], bb[nb + 4], bb[nb + 5])
                admit = (near <= far) & (far >= 1e-3) & (near <= btc)
                any_hit = jnp.any(admit)
                is_leaf = links[nl + 1] > 0
                take = any_hit & is_leaf
                buf[nbuf] = links[nl]
                nbuf = jnp.where(take, nbuf + 1, nbuf)
                node = jnp.where(any_hit & (~is_leaf), node + 1, links[nl + 2])
                return node, nbuf, acc + jnp.sum(near) * 1e-20

            def outer(state):
                node, acc = state
                node, nbuf, acc = jax.lax.while_loop(
                    lambda s: (s[0] < m_nodes) & (s[1] < 8), walk,
                    (node, jnp.asarray(0, jnp.int32), acc))
                return node, acc

            _, acc = jax.lax.while_loop(lambda s: s[0] < m_nodes, outer,
                                        (jnp.asarray(0, jnp.int32), acc))
            return acc

        acc = jax.lax.fori_loop(0, GROUP, packet,
                                jnp.zeros((1, PACKET), jnp.float32))
        acc8 = jnp.concatenate([acc] * 8, axis=0)
        out[0:1, :, :] = acc8.reshape(1, 8, PACKET)

    run_a = make(walk_narrow)
    run_b = make(walk_wide)
    run_c = make_flat(walk_lane)
    run_d = make_flat(walk_lane_buf, scratch=(pltpu.SMEM((8,), jnp.int32),))
    bench(run_a, rays, pk_bb, pk_links, label="A col walk (128/pkt)", n=n)
    bench(run_b, rays, pk_bb, pk_links, label="B col walk (1024/pkt)", n=n)
    bench(run_c, rays, bb_flat, links_flat, label="C lane walk + cap", n=n)
    bench(run_d, rays, bb_flat, links_flat, label="D lane walk + buf/seg", n=n)


if __name__ == "__main__":
    main()
