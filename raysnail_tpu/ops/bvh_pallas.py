"""Pallas TPU kernel: packet BVH traversal, phase-split (scalar walk + fat
vectorized leaf sweep).

XLA lowers the lockstep traversal's per-ray node fetches to serialized
gathers (measured ~150x slower than everything else), and per-lane dynamic
indexing isn't a VPU operation at all. The TPU-native formulation is PACKET
traversal: each grid program owns a tile of rays and visits the UNION of BVH
nodes any ray in the packet needs. Two earlier designs lost to the dense
sweep and taught the layout rules this version is built on:

  v1 kept rays as (N, 1) columns — every slab op ran on 1 of 128 VPU lanes
  (~1us/node). v2 vectorized the slab test and made leaves 128 triangles
  wide, but carried per-ray best-hit state through the traversal while_loop
  in column layout: four (1024, 1) carries = 512 vregs, spilled and copied
  every node step (~1.5us/node measured, swamping the 25-cycle math).

v3 therefore splits the traversal so the serial part touches no vectors:

  PHASE 1 — scalar walk. The packet's bounds (origin box, inv-direction
  interval, both reduced once per packet) give a conservative interval slab
  test per node — ~40 scalar ops, no vector carries at all. Hit leaves push
  their block id into SMEM scratch. Conservative means it may ADMIT extra
  leaves (different rays maximize different axes) but never prunes a leaf
  any ray needs.

  PHASE 2 — fat leaf sweep. fori_loop over the collected blocks; each block
  holds LANES=128 triangles stored field-major-transposed (B, 128, 16) so
  triangles land on sublanes and broadcast against the ray rows on lanes:
  a (128, 128) Cramer solve per ray-row, min-reduced over sublanes into
  ROW-layout (ROWS, 128) best-hit carries — 4 vregs per carry, no spills.

Coherent packets (primary rays from a pixel tile) collect near the per-ray
optimal leaf set; incoherent bounce packets degrade toward a bounded dense
sweep (direction-octant sorting in the wrapper restores partial coherence).
Triangle data lives in VMEM whole: 8KB per 128-triangle block, ~1M
triangles; beyond that leaf blocks would stream with double-buffered DMA.

Replaces the recursive traversal of the reference (src/hittable/collection/
bvh.rs:173-192) and its per-ray AABB slab test (src/prelude/aabb.rs:20-38).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raysnail_tpu.geometry.hit import BIG

LANES = 128          # triangles per leaf block == VPU lane count
ROWS = 8             # sublane rows per ray block (Mosaic f32 minimum)
TILE_R = ROWS * LANES  # rays per packet/program (1024)


def _kernel(oxr, oyr, ozr, dxr, dyr, dzr, bb, links, tri, bounds,
            t_out, tri_out, beta_out, gamma_out, blocks, *,
            n_nodes: int, n_blocks: int, kind: str = "tri"):
    """Refs:
      rays:  (ROWS, 128) f32 x6
      bb:    (M, 8)  f32 [min.xyz, max.xyz, pad, pad]
      links: (M, 8)  i32 [leaf_block, count, miss, pad...]
      tri:   (B, 128, 16) f32 transposed leaf blocks, fields on the minor
             axis. kind="tri": 0-2 p0.xyz, 3-5 (p0-p1).xyz, 6-8 (p0-p2).xyz,
             9 valid. kind="sphere": 0-2 center.xyz, 3 r^2, 4 valid (the
             beta/gamma outputs are zeros).
      bounds: (1, 2) SMEM [t_min, t_max]
      blocks: (n_blocks,) i32 SMEM scratch — leaf blocks this packet visits
    """
    t_min = bounds[0, 0]
    t_max = bounds[0, 1]
    o_x, o_y, o_z = oxr[:], oyr[:], ozr[:]
    d_x, d_y, d_z = dxr[:], dyr[:], dzr[:]
    eps = 1e-12
    inv_x = 1.0 / jnp.where(jnp.abs(d_x) < eps, jnp.where(d_x < 0, -eps, eps), d_x)
    inv_y = 1.0 / jnp.where(jnp.abs(d_y) < eps, jnp.where(d_y < 0, -eps, eps), d_y)
    inv_z = 1.0 / jnp.where(jnp.abs(d_z) < eps, jnp.where(d_z < 0, -eps, eps), d_z)

    # packet bounds: one-time vector->scalar reductions
    ox0, ox1 = jnp.min(o_x), jnp.max(o_x)
    oy0, oy1 = jnp.min(o_y), jnp.max(o_y)
    oz0, oz1 = jnp.min(o_z), jnp.max(o_z)
    ix0, ix1 = jnp.min(inv_x), jnp.max(inv_x)
    iy0, iy1 = jnp.min(inv_y), jnp.max(inv_y)
    iz0, iz1 = jnp.min(inv_z), jnp.max(inv_z)

    def axis_interval(plane_lo, plane_hi, o0, o1, i0, i1):
        """Conservative [min t_enter, max t_exit] of the slab over all rays
        with origin in [o0,o1] and inv-direction in [i0,i1]."""
        a0, a1 = plane_lo - o1, plane_lo - o0   # interval of (lo - o)
        b0, b1 = plane_hi - o1, plane_hi - o0
        p = (a0 * i0, a0 * i1, a1 * i0, a1 * i1,
             b0 * i0, b0 * i1, b1 * i0, b1 * i1)
        lo = jnp.minimum(
            jnp.minimum(jnp.minimum(p[0], p[1]), jnp.minimum(p[2], p[3])),
            jnp.minimum(jnp.minimum(p[4], p[5]), jnp.minimum(p[6], p[7])))
        hi = jnp.maximum(
            jnp.maximum(jnp.maximum(p[0], p[1]), jnp.maximum(p[2], p[3])),
            jnp.maximum(jnp.maximum(p[4], p[5]), jnp.maximum(p[6], p[7])))
        return lo, hi

    # ---- phase 1: scalar walk, collect leaf blocks ----
    def walk_body(state):
        node, nhit = state
        nrow = bb[pl.ds(node, 1), :]          # (1, 8)
        nx0, nx1 = axis_interval(nrow[0, 0], nrow[0, 3], ox0, ox1, ix0, ix1)
        ny0, ny1 = axis_interval(nrow[0, 1], nrow[0, 4], oy0, oy1, iy0, iy1)
        nz0, nz1 = axis_interval(nrow[0, 2], nrow[0, 5], oz0, oz1, iz0, iz1)
        near_lo = jnp.maximum(jnp.maximum(nx0, ny0), nz0)
        far_hi = jnp.minimum(jnp.minimum(nx1, ny1), nz1)
        any_hit = (near_lo <= far_hi) & (far_hi >= t_min) & (near_lo <= t_max)

        lrow = links[pl.ds(node, 1), :]
        first_blk = lrow[0, 0]
        is_leaf = lrow[0, 1] > 0
        miss = lrow[0, 2]

        take = any_hit & is_leaf

        @pl.when(take)
        def _():
            blocks[nhit] = first_blk

        nhit = jnp.where(take, nhit + 1, nhit)
        node = jnp.where(any_hit & (~is_leaf), node + 1, miss)
        return node, nhit

    _, nhit = jax.lax.while_loop(
        lambda s: s[0] < n_nodes, walk_body,
        (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32)),
    )

    # ---- phase 2: vectorized sweep over collected leaf blocks ----
    sub = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)

    def leaf_body(i, carry):
        bt, btri, bbeta, bgamma = carry
        blk = blocks[i]
        m = tri[pl.ds(blk, 1), :, :].reshape(LANES, 16)
        if kind == "tri":
            p0x, p0y, p0z = m[:, 0:1], m[:, 1:2], m[:, 2:3]   # (128, 1)
            ax, ay, az = m[:, 3:4], m[:, 4:5], m[:, 5:6]
            ddx, ddy, ddz = m[:, 6:7], m[:, 7:8], m[:, 8:9]
            tvalid = m[:, 9:10]
        else:
            cx, cy, cz = m[:, 0:1], m[:, 1:2], m[:, 2:3]
            rr2 = m[:, 3:4]
            tvalid = m[:, 4:5]

        new_rows = []
        for r in range(ROWS):
            oxw, oyw, ozw = o_x[r:r+1, :], o_y[r:r+1, :], o_z[r:r+1, :]
            dxw, dyw, dzw = d_x[r:r+1, :], d_y[r:r+1, :], d_z[r:r+1, :]
            bt_r = bt[r:r+1, :]
            if kind == "tri":
                # Cramer's-rule barycentric solve (triangle_mesh.rs:85-131),
                # (128, 1) triangles x (1, 128) rays -> (128, 128)
                j = p0x - oxw
                k = p0y - oyw
                l = p0z - ozw
                eihf = ddy * dzw - dyw * ddz
                gfdi = dxw * ddz - ddx * dzw
                dheg = ddx * dyw - ddy * dxw
                denom = ax * eihf + ay * gfdi + az * dheg
                denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
                beta = (j * eihf + k * gfdi + l * dheg) / denom
                akjb = ax * k - j * ay
                jcal = j * az - ax * l
                blkc = ay * l - k * az
                gamma = (dzw * akjb + dyw * jcal + dxw * blkc) / denom
                t = -(ddz * akjb + ddy * jcal + ddx * blkc) / denom
                ok = (
                    (beta >= 0.0) & (beta < 1.0) & (gamma > 0.0)
                    & (beta + gamma < 1.0) & (t >= t_min) & (t <= t_max)
                    & (tvalid > 0.0) & (t < bt_r)
                )
            else:
                # half-b quadratic, t1-else-t2 in-range rule
                # (sphere.rs:83-109); (128,1) spheres x (1,128) rays
                lx = oxw - cx
                ly = oyw - cy
                lz = ozw - cz
                half_b = dxw * lx + dyw * ly + dzw * lz
                cc = lx * lx + ly * ly + lz * lz - rr2
                delta = half_b * half_b - cc
                sq = jnp.sqrt(jnp.maximum(delta, 0.0))
                t1 = -half_b - sq
                t2 = -half_b + sq
                okd = (delta > 0.0) & (tvalid > 0.0)
                in1 = okd & (t_min < t1) & (t1 < t_max)
                in2 = okd & (t_min < t2) & (t2 < t_max)
                t = jnp.where(in1, t1, t2)
                ok = (in1 | in2) & (t < bt_r)
                beta = gamma = t  # unused; selected values are ignored
            tm = jnp.where(ok, t, BIG)
            rmin = jnp.min(tm, axis=0, keepdims=True)        # (1, 128) rays
            arg = jnp.min(jnp.where(tm == rmin, sub, LANES), axis=0,
                          keepdims=True)
            sel = sub == arg
            take = rmin < bt_r
            if kind == "tri":
                bsel = jnp.sum(jnp.where(sel, beta, 0.0), axis=0, keepdims=True)
                gsel = jnp.sum(jnp.where(sel, gamma, 0.0), axis=0, keepdims=True)
                nb = jnp.where(take, bsel, bbeta[r:r+1, :])
                ng = jnp.where(take, gsel, bgamma[r:r+1, :])
            else:
                nb = bbeta[r:r+1, :]
                ng = bgamma[r:r+1, :]
            new_rows.append((
                jnp.where(take, rmin, bt_r),
                jnp.where(take, blk * LANES + arg, btri[r:r+1, :]),
                nb, ng,
            ))
        return (
            jnp.concatenate([x[0] for x in new_rows], axis=0),
            jnp.concatenate([x[1] for x in new_rows], axis=0),
            jnp.concatenate([x[2] for x in new_rows], axis=0),
            jnp.concatenate([x[3] for x in new_rows], axis=0),
        )

    init = (
        jnp.full((ROWS, LANES), BIG, jnp.float32),
        jnp.zeros((ROWS, LANES), jnp.int32),
        jnp.zeros((ROWS, LANES), jnp.float32),
        jnp.zeros((ROWS, LANES), jnp.float32),
    )
    bt, btri, bbeta, bgamma = jax.lax.fori_loop(0, nhit, leaf_body, init)
    t_out[:] = bt
    tri_out[:] = btri
    beta_out[:] = bbeta
    gamma_out[:] = bgamma


@functools.partial(jax.jit, static_argnames=("interpret",))
def bvh_traverse(origin_xyz, dir_xyz, bb_packed, links_packed, tri_packed,
                 t_min, t_max, interpret: bool = False):
    """-> (t, tri_idx, beta, gamma), each (N,); tri_idx indexes the fat-leaf
    (pallas) triangle order. Caller pads N to TILE_R.

    bb_packed (M,8) f32, links_packed (M,8) i32, tri_packed (B,128,16) f32 —
    see scene._build_triangles."""
    ox, oy, oz = (jnp.asarray(a, jnp.float32) for a in origin_xyz)
    dx, dy, dz = (jnp.asarray(a, jnp.float32) for a in dir_xyz)
    n = ox.shape[0]
    assert n % TILE_R == 0, n
    m = bb_packed.shape[0]
    n_blocks = tri_packed.shape[0]

    row = lambda a: a.reshape(-1, LANES)
    bounds = jnp.asarray([[t_min, t_max]], jnp.float32)

    row_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full2 = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    full3 = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    t, tri_idx, beta, gamma = pl.pallas_call(
        functools.partial(_kernel, n_nodes=m, n_blocks=n_blocks),
        grid=(n // TILE_R,),
        in_specs=[row_spec] * 6
        + [full2(bb_packed), full2(links_packed), full3(tri_packed),
           pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=(row_spec, row_spec, row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # whole-mesh VMEM residency: 8KB per 128-tri block; Mosaic's
            # default 16MB scoped limit caps at ~30k tris, v5e has 128MB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=[pltpu.SMEM((max(n_blocks, 1),), jnp.int32)],
        interpret=interpret,
    )(
        row(ox), row(oy), row(oz), row(dx), row(dy), row(dz),
        bb_packed, links_packed, tri_packed, bounds,
    )
    flat = lambda a: a.reshape(-1)
    return flat(t), flat(tri_idx), flat(beta), flat(gamma)
