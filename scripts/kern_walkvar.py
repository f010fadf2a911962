#!/usr/bin/env python
"""Bisect the real kernel's walk slowdown: V0 plain walk, V1 +links/take
logic, V2 +SMEM buf store, V3 +nested chunk loop structure."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PACKET = 128
LANES = 128
GROUP = 8
REPS = 32
CHUNK = 8


def main():
    from mesh_profile import build_mesh_scene
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.camera import generate_rays
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import _tile_grid

    print("device:", jax.devices()[0], flush=True)
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
    m_nodes = g.pk_bb.shape[1]
    bb_flat = g.pk_bb.reshape(-1)
    lk_flat = g.pk_links.reshape(-1)
    n_orders = g.pk_bb.shape[0]
    print(f"nodes={m_nodes} orders={n_orders}", flush=True)

    def make_kernel(variant):
        def kern(rays, bb, links, prim, out, buf):
            def packet(pidx, acc):
                rows = rays[pl.ds(pidx, 1), :, :].reshape(8, PACKET)
                cols = jnp.transpose(rows, (1, 0))
                o_x, o_y, o_z = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
                d_x, d_y, d_z = cols[:, 3:4], cols[:, 4:5], cols[:, 5:6]
                inv = lambda d: 1.0 / jnp.where(
                    jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
                ivx, ivy, ivz = inv(d_x), inv(d_y), inv(d_z)
                if n_orders == 8:
                    oct_ = ((jnp.sum(d_x) < 0).astype(jnp.int32) * 4
                            + (jnp.sum(d_y) < 0).astype(jnp.int32) * 2
                            + (jnp.sum(d_z) < 0).astype(jnp.int32))
                else:
                    oct_ = jnp.asarray(0, jnp.int32)
                bbb = oct_ * (m_nodes * 8)
                lkb = oct_ * (m_nodes * 4)

                def slab(node):
                    nb = bbb + node * 8
                    ax0 = (bb[nb] - o_x) * ivx
                    ax1 = (bb[nb + 3] - o_x) * ivx
                    ay0 = (bb[nb + 1] - o_y) * ivy
                    ay1 = (bb[nb + 4] - o_y) * ivy
                    az0 = (bb[nb + 2] - o_z) * ivz
                    az1 = (bb[nb + 5] - o_z) * ivz
                    near = jnp.maximum(jnp.maximum(jnp.minimum(ax0, ax1),
                                                   jnp.minimum(ay0, ay1)),
                                       jnp.minimum(az0, az1))
                    far = jnp.minimum(jnp.minimum(jnp.maximum(ax0, ax1),
                                                  jnp.maximum(ay0, ay1)),
                                      jnp.maximum(az0, az1))
                    return near, far

                if variant == 0:
                    def walk(state):
                        node, acc = state
                        near, far = slab(node)
                        admit = (near <= far) & (far >= 1e-3)
                        any_hit = jnp.any(admit)
                        nl = lkb + node * 4
                        is_leaf = links[nl + 1] > 0
                        node = jnp.where(any_hit & (~is_leaf), node + 1,
                                         links[nl + 2])
                        return node, acc + jnp.sum(near) * 1e-20
                    _, acc = jax.lax.while_loop(
                        lambda s: s[0] < m_nodes, walk,
                        (jnp.asarray(0, jnp.int32), acc))
                    return acc
                if variant == 1:
                    def walk(state):
                        node, nbuf, acc = state
                        near, far = slab(node)
                        admit = (near <= far) & (far >= 1e-3)
                        any_hit = jnp.any(admit)
                        nl = lkb + node * 4
                        is_leaf = links[nl + 1] > 0
                        take = any_hit & is_leaf
                        nbuf = jnp.where(take, nbuf + 1, nbuf)
                        node = jnp.where(any_hit & (~is_leaf), node + 1,
                                         links[nl + 2])
                        return node, nbuf, acc + jnp.sum(near) * 1e-20
                    _, _, acc = jax.lax.while_loop(
                        lambda s: s[0] < m_nodes, walk,
                        (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                         acc))
                    return acc
                if variant == 2:
                    def walk(state):
                        node, nbuf, acc = state
                        near, far = slab(node)
                        admit = (near <= far) & (far >= 1e-3)
                        any_hit = jnp.any(admit)
                        nl = lkb + node * 4
                        is_leaf = links[nl + 1] > 0
                        take = any_hit & is_leaf
                        buf[jnp.minimum(nbuf, CHUNK - 1)] = links[nl]
                        nbuf = jnp.where(take, nbuf + 1, nbuf)
                        node = jnp.where(any_hit & (~is_leaf), node + 1,
                                         links[nl + 2])
                        return node, nbuf, acc + jnp.sum(near) * 1e-20
                    _, _, acc = jax.lax.while_loop(
                        lambda s: s[0] < m_nodes, walk,
                        (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                         acc))
                    return acc
                # variants 3-5: nested chunk loops; 4/5 add a real Cramer
                # sweep of buffered blocks (4: blk from SMEM buf; 5: blk = j)
                def tri_sweep(blk, bt):
                    m = prim[pl.ds(blk, 1), :, :].reshape(prim.shape[1], LANES)
                    fld = lambda i: m[i:i + 1, :]
                    j_ = fld(0) - o_x
                    k_ = fld(1) - o_y
                    l_ = fld(2) - o_z
                    ax, ay, az = fld(3), fld(4), fld(5)
                    ddx, ddy, ddz = fld(6), fld(7), fld(8)
                    eihf = ddy * d_z - d_y * ddz
                    gfdi = d_x * ddz - ddx * d_z
                    dheg = ddx * d_y - ddy * d_x
                    denom = ax * eihf + ay * gfdi + az * dheg
                    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
                    beta = (j_ * eihf + k_ * gfdi + l_ * dheg) / denom
                    akjb = ax * k_ - j_ * ay
                    jcal = j_ * az - ax * l_
                    blkc = ay * l_ - k_ * az
                    gamma = (d_z * akjb + d_y * jcal + d_x * blkc) / denom
                    t = -(ddz * akjb + ddy * jcal + ddx * blkc) / denom
                    ok = ((beta >= 0.0) & (beta < 1.0) & (gamma > 0.0)
                          & (beta + gamma < 1.0) & (t >= 1e-3) & (t <= 1e30)
                          & (fld(9) > 0.0) & (t < bt))
                    tm = jnp.where(ok, t, 1e30)
                    rmin = jnp.min(tm, axis=1, keepdims=True)
                    return jnp.minimum(bt, rmin)

                btc = jnp.full((PACKET, 1), 1e30, jnp.float32)

                def walk_seg(state):
                    node, nbuf, acc = state
                    near, far = slab(node)
                    admit = (near <= far) & (far >= 1e-3)
                    any_hit = jnp.any(admit)
                    nl = lkb + node * 4
                    is_leaf = links[nl + 1] > 0
                    take = any_hit & is_leaf
                    buf[nbuf] = links[nl]
                    nbuf = jnp.where(take, nbuf + 1, nbuf)
                    node = jnp.where(any_hit & (~is_leaf), node + 1,
                                     links[nl + 2])
                    return node, nbuf, acc + jnp.sum(near) * 1e-20

                if variant < 7:
                    def outer(state):
                        node, bt, acc = state
                        node, nbuf, acc = jax.lax.while_loop(
                            lambda s: (s[0] < m_nodes) & (s[1] < CHUNK),
                            walk_seg, (node, jnp.asarray(0, jnp.int32), acc))
                        if variant >= 4:
                            def sweep_j(sj, bt):
                                blk = buf[sj] if variant == 4 else sj
                                return tri_sweep(blk, bt)
                            bt = jax.lax.fori_loop(0, nbuf, sweep_j, bt)
                        return node, bt, acc

                    _, bt, acc = jax.lax.while_loop(
                        lambda s: s[0] < m_nodes, outer,
                        (jnp.asarray(0, jnp.int32),
                         jnp.full((PACKET, 1), 1e30, jnp.float32), acc))
                    return acc + bt * 1e-30

                # V7/V8: V4 + five extra (128,1) vector carries (as the real
                # kernel's attribute channels); V8 also packs the outputs
                z = jnp.zeros((PACKET, 1), jnp.float32)

                def outer7(state):
                    node, bt, a0, a1, a2, a3, a4, acc = state
                    node, nbuf, acc = jax.lax.while_loop(
                        lambda s: (s[0] < m_nodes) & (s[1] < CHUNK),
                        walk_seg, (node, jnp.asarray(0, jnp.int32), acc))

                    def sweep_j(sj, args):
                        bt, a0, a1, a2, a3, a4 = args
                        nbt = tri_sweep(buf[sj], bt)
                        take = nbt < bt
                        upd = lambda a: jnp.where(take, a + 1.0, a)
                        return (nbt, upd(a0), upd(a1), upd(a2), upd(a3),
                                upd(a4))

                    bt, a0, a1, a2, a3, a4 = jax.lax.fori_loop(
                        0, nbuf, sweep_j, (bt, a0, a1, a2, a3, a4))
                    return node, bt, a0, a1, a2, a3, a4, acc

                _, bt, a0, a1, a2, a3, a4, acc = jax.lax.while_loop(
                    lambda s: s[0] < m_nodes, outer7,
                    (jnp.asarray(0, jnp.int32),
                     jnp.full((PACKET, 1), 1e30, jnp.float32),
                     z, z, z, z, z, acc))
                if variant == 8:
                    packed = jnp.concatenate(
                        [bt, a0, a1, a2, a3, a4, z, z], axis=1)
                    out[pl.ds(pidx, 1), :, :] = jnp.transpose(
                        packed, (1, 0)).reshape(1, 8, PACKET)
                return acc + bt * 1e-30 + a0 * 1e-30

            acc = jax.lax.fori_loop(0, GROUP, packet,
                                    jnp.zeros((PACKET, 1), jnp.float32))
            acc8 = jnp.concatenate([acc] * 8, axis=1)
            out[0:1, :, :] = jnp.transpose(acc8, (1, 0)).reshape(1, 8, PACKET)

        return kern

    blk_spec = pl.BlockSpec((GROUP, 8, PACKET), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem1 = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0,),
                                     memory_space=pltpu.SMEM)
    full3 = pl.BlockSpec(g.pk_tri.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    variants = [int(v) for v in
                os.environ.get("RAYSNAIL_VARS", "0,1,2,3,4,5").split(",")]
    for v in variants:
        call = pl.pallas_call(
            make_kernel(v),
            grid=(npk // (GROUP * PACKET),),
            in_specs=[blk_spec, smem1(bb_flat), smem1(lk_flat), full3],
            out_specs=blk_spec,
            out_shape=jax.ShapeDtypeStruct((npk // PACKET, 8, PACKET),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            scratch_shapes=[pltpu.SMEM((CHUNK,), jnp.int32)],
        )

        @jax.jit
        def run(rays, bb, links, prim, call=call):
            def body(c, _):
                o = call(rays, bb, links, prim)
                return c + o[0, 0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
            return c

        t0 = time.time()
        float(run(rays, bb_flat, lk_flat, g.pk_tri))
        comp = time.time() - t0
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            float(run(rays, bb_flat, lk_flat, g.pk_tri))
            best = min(best, time.time() - t0)
        best /= REPS
        print(f"V{v}: {best*1e3:7.2f} ms ({n/best/1e6:7.2f} Mrays/s) "
              f"[compile {comp:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
