#!/usr/bin/env python
"""Isolate v4 kernel costs on the chip: I/O-only vs sweep-only vs walk-only
vs full, plus row-vs-column ray DMA."""

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
LANES = 128


def setup():
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.camera import generate_rays
    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import _tile_grid
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from mesh_profile import build_mesh_scene

    cfg = RenderConfig(width=320, height=200, samples=16, max_depth=6)
    scene, cam = build_mesh_scene(cfg)
    px, py, _ = _tile_grid(cfg)
    px = jnp.asarray(px, cfg.dtype); py = jnp.asarray(py, cfg.dtype)
    keys = prng.fast_streams(prng.key(7), (py * cfg.width + px).astype(jnp.int32))
    ray = generate_rays(cam, px, py, jnp.zeros_like(px), jnp.zeros_like(py),
                        4, cfg.width, cfg.height, keys)
    g = scene.arrays.triangles
    return ray, g


def bench(fn, *args, label=""):
    t0 = time.time()
    float(jnp.sum(fn(*args)[0]))
    comp = time.time() - t0
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        float(jnp.sum(fn(*args)[0]))
        best = min(best, time.time() - t0)
    n = 64000
    print(f"{label}: {best*1e3:7.1f} ms ({n/best/1e6:6.2f} Mrays/s) "
          f"[compile {comp:.0f}s]", flush=True)


def tri_sweep(m, o_x, o_y, o_z, d_x, d_y, d_z, bt, t_min, t_max):
    fld = lambda i: m[i:i + 1, :]
    j = fld(0) - o_x
    k = fld(1) - o_y
    l = fld(2) - o_z
    ax, ay, az = fld(3), fld(4), fld(5)
    ddx, ddy, ddz = fld(6), fld(7), fld(8)
    eihf = ddy * d_z - d_y * ddz
    gfdi = d_x * ddz - ddx * d_z
    dheg = ddx * d_y - ddy * d_x
    denom = ax * eihf + ay * gfdi + az * dheg
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    beta = (j * eihf + k * gfdi + l * dheg) / denom
    akjb = ax * k - j * ay
    jcal = j * az - ax * l
    blkc = ay * l - k * az
    gamma = (d_z * akjb + d_y * jcal + d_x * blkc) / denom
    t = -(ddz * akjb + ddy * jcal + ddx * blkc) / denom
    ok = ((beta >= 0.0) & (beta < 1.0) & (gamma > 0.0)
          & (beta + gamma < 1.0) & (t >= t_min) & (t <= t_max)
          & (fld(9) > 0.0) & (t < bt))
    tm = jnp.where(ok, t, 1e30)
    return jnp.minimum(bt, jnp.min(tm, axis=1, keepdims=True))


def make_kernels(m_nodes, n_blocks, nf):
    def io_kernel(oxr, oyr, ozr, dxr, dyr, dzr, bb, links, prim, t_out):
        t_out[:] = oxr[:] + dxr[:] + oyr[:] + dyr[:] + ozr[:] + dzr[:]

    def sweep_kernel(oxr, oyr, ozr, dxr, dyr, dzr, bb, links, prim, t_out):
        col = lambda r: r[:].reshape(PACKET, 1)
        o_x, o_y, o_z = col(oxr), col(oyr), col(ozr)
        d_x, d_y, d_z = col(dxr), col(dyr), col(dzr)

        def body(i, bt):
            mm = prim[pl.ds(i, 1), :, :].reshape(nf, LANES)
            return tri_sweep(mm, o_x, o_y, o_z, d_x, d_y, d_z, bt, 1e-3, 1e30)

        bt = jax.lax.fori_loop(0, n_blocks,  body,
                               jnp.full((PACKET, 1), 1e30, jnp.float32))
        t_out[:] = bt.reshape(1, PACKET, 1)

    def walk_kernel(oxr, oyr, ozr, dxr, dyr, dzr, bb, links, prim, t_out):
        col = lambda r: r[:].reshape(PACKET, 1)
        o_x, o_y, o_z = col(oxr), col(oyr), col(ozr)
        d_x, d_y, d_z = col(dxr), col(dyr), col(dzr)
        eps = 1e-12
        inv = lambda d: 1.0 / jnp.where(jnp.abs(d) < eps,
                                        jnp.where(d < 0, -eps, eps), d)
        inv_x, inv_y, inv_z = inv(d_x), inv(d_y), inv(d_z)

        def walk(state):
            node, bt = state
            ax0 = (bb[node, 0] - o_x) * inv_x
            ax1 = (bb[node, 3] - o_x) * inv_x
            ay0 = (bb[node, 1] - o_y) * inv_y
            ay1 = (bb[node, 4] - o_y) * inv_y
            az0 = (bb[node, 2] - o_z) * inv_z
            az1 = (bb[node, 5] - o_z) * inv_z
            near = jnp.maximum(jnp.maximum(jnp.minimum(ax0, ax1),
                                           jnp.minimum(ay0, ay1)),
                               jnp.minimum(az0, az1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(ax0, ax1),
                                          jnp.maximum(ay0, ay1)),
                              jnp.maximum(az0, az1))
            admit = (near <= far) & (far >= 1e-3) & (near <= bt)
            any_hit = jnp.any(admit)
            is_leaf = links[node, 1] > 0
            miss = links[node, 2]
            bt = jnp.where(any_hit & is_leaf, jnp.minimum(bt, near + 1e30 * 0), bt)
            node = jnp.where(any_hit & (~is_leaf), node + 1, miss)
            return node, bt

        _, bt = jax.lax.while_loop(
            lambda s: s[0] < m_nodes, walk,
            (jnp.asarray(0, jnp.int32), jnp.full((PACKET, 1), 1e30, jnp.float32)))
        t_out[:] = bt.reshape(1, PACKET, 1)

    return io_kernel, sweep_kernel, walk_kernel


def main():
    print("device:", jax.devices()[0], flush=True)
    ray, g = setup()
    n = ray.origin.x.shape[0]
    nf = g.pk_tri.shape[1]
    n_blocks = g.pk_tri.shape[0]
    m_nodes = g.pk_bb.shape[0]
    print(f"blocks={n_blocks} nodes={m_nodes} nf={nf}", flush=True)

    io_k, sweep_k, walk_k = make_kernels(m_nodes, n_blocks, nf)

    col3 = lambda a: a.reshape(-1, PACKET, 1)
    row_spec = pl.BlockSpec((1, PACKET, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                    memory_space=pltpu.SMEM)
    full3 = pl.BlockSpec(g.pk_tri.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    common = dict(
        grid=(n // PACKET,),
        in_specs=[row_spec] * 6 + [smem(g.pk_bb), smem(g.pk_links), full3],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n // PACKET, PACKET, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    args6 = [col3(a) for a in (ray.origin.x, ray.origin.y, ray.origin.z,
                               ray.direction.x, ray.direction.y, ray.direction.z)]

    @jax.jit
    def run_io(*a):
        return (pl.pallas_call(io_k, **common)(*a, g.pk_bb, g.pk_links, g.pk_tri),)

    @jax.jit
    def run_sweep(*a):
        return (pl.pallas_call(sweep_k, **common)(*a, g.pk_bb, g.pk_links, g.pk_tri),)

    @jax.jit
    def run_walk(*a):
        return (pl.pallas_call(walk_k, **common)(*a, g.pk_bb, g.pk_links, g.pk_tri),)

    bench(run_io, *args6, label="io-only  (col DMA)")
    bench(run_walk, *args6, label="walk-only")
    bench(run_sweep, *args6, label=f"sweep-all ({n_blocks} blocks)")

    # row-layout I/O for comparison: (1, 8, 128) blocks = 1024 rays/program
    npad = n + ((-n) % 1024)
    padv = lambda a: jnp.pad(a, (0, npad - n))
    row3 = lambda a: padv(a).reshape(-1, 8, PACKET)
    rspec3 = pl.BlockSpec((1, 8, PACKET), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def io2(oxr, oyr, ozr, dxr, dyr, dzr, t_out):
        t_out[:] = oxr[:] + dxr[:] + oyr[:] + dyr[:] + ozr[:] + dzr[:]

    @jax.jit
    def run_io2(*a):
        return (pl.pallas_call(
            io2, grid=(npad // (8 * PACKET),), in_specs=[rspec3] * 6,
            out_specs=rspec3,
            out_shape=jax.ShapeDtypeStruct((npad // (8 * PACKET), 8, PACKET),
                                           jnp.float32),
        )(*a),)

    bench(run_io2, *[row3(a) for a in (ray.origin.x, ray.origin.y, ray.origin.z,
                                       ray.direction.x, ray.direction.y,
                                       ray.direction.z)],
          label="io-only  (row DMA, 1024/prog)")

    # row load + in-kernel transpose to column layout
    def io3(oxr, oyr, ozr, dxr, dyr, dzr, t_out):
        tr = lambda r: jnp.transpose(r[:].reshape(8, PACKET), (1, 0))
        s = tr(oxr) + tr(dxr) + tr(oyr) + tr(dyr) + tr(ozr) + tr(dzr)
        t_out[:] = jnp.transpose(s, (1, 0)).reshape(1, 8, PACKET)

    @jax.jit
    def run_io3(*a):
        return (pl.pallas_call(
            io3, grid=(npad // (8 * PACKET),), in_specs=[rspec3] * 6,
            out_specs=rspec3,
            out_shape=jax.ShapeDtypeStruct((npad // (8 * PACKET), 8, PACKET),
                                           jnp.float32),
        )(*a),)

    bench(run_io3, *[row3(a) for a in (ray.origin.x, ray.origin.y, ray.origin.z,
                                       ray.direction.x, ray.direction.y,
                                       ray.direction.z)],
          label="io+transpose (row DMA)")

    # planned v4.1 structure: ONE packed (R, 8, 128) input per 128-ray packet,
    # one in-kernel transpose, one packed output
    npk = n + ((-n) % PACKET)
    fields = [jnp.pad(a, (0, npk - n)) for a in
              (ray.origin.x, ray.origin.y, ray.origin.z,
               ray.direction.x, ray.direction.y, ray.direction.z)]
    fields += [jnp.zeros(npk, jnp.float32), jnp.zeros(npk, jnp.float32)]
    packed = jnp.swapaxes(jnp.stack(fields).reshape(8, -1, PACKET), 0, 1)
    pk_spec = pl.BlockSpec((1, 8, PACKET), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

    def io4(rays_ref, out_ref):
        cols = jnp.transpose(rays_ref[:].reshape(8, PACKET), (1, 0))
        o_x = cols[:, 0:1]
        d_x = cols[:, 3:4]
        s = o_x * 2.0 + d_x
        outs = jnp.concatenate([s] * 8, axis=1)
        out_ref[:] = jnp.transpose(outs, (1, 0)).reshape(1, 8, PACKET)

    @jax.jit
    def run_io4(p):
        return (pl.pallas_call(
            io4, grid=(npk // PACKET,), in_specs=[pk_spec], out_specs=pk_spec,
            out_shape=jax.ShapeDtypeStruct((npk // PACKET, 8, PACKET),
                                           jnp.float32),
        )(p),)

    bench(run_io4, packed, label="packed io+2transp/128")


if __name__ == "__main__":
    main()
