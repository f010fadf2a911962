"""Pallas TPU kernel: packet BVH traversal for triangle meshes.

XLA lowers the lockstep traversal's per-ray node fetches to serialized
gathers (measured ~150x slower than everything else), and per-lane dynamic
indexing isn't a VPU operation at all. The TPU-native formulation is PACKET
traversal: each grid program owns a tile of rays and walks the skip-link BVH
with a single SCALAR node pointer — scalar dynamic slices of VMEM arrays are
legal and fast — visiting the UNION of nodes any ray in the packet needs:

  * node AABB loaded once per step as scalars, slab-tested against the whole
    ray tile on the VPU;
  * descend (node+1) if ANY active lane hits the box, else jump miss[node];
  * leaves load LEAF_SIZE triangles as scalars and test all lanes.

Coherent packets (primary rays from a pixel tile) visit nearly the per-ray
optimal node set; incoherent bounce packets degrade gracefully toward a
bounded sweep. Triangle and node data live in VMEM whole (fits up to ~100k
triangles; larger meshes would stream leaf blocks with double-buffered DMA).

Round-1 v5e measurement (12k-tri knot, depth-6 bounce rays): bit-identical
results to the XLA traversal, 7x slower than the dense brute sweep — the
serial per-packet walk pays ~1us/node and incoherent bounce packets visit
thousands of nodes. The kernel is therefore the LARGE-mesh path (brute is
O(F) and wins below ~32k tris); round-2 avenues: BVH8 nodes (4x fewer
steps), direction-octant ray sorting (packet coherence), leaf test without
lax.cond.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raysnail_tpu.accel.bvh import LEAF_SIZE
from raysnail_tpu.geometry.hit import BIG

TILE_R = 256  # rays per packet/program


def _kernel(ox, oy, oz, dx, dy, dz, bb, links, tri, bounds,
            t_out, tri_out, beta_out, gamma_out, *, n_nodes: int):
    """Refs:
      rays: (TILE_R, 1) f32 x6
      bb:   (M, 8)  f32 [min.xyz, max.xyz, pad, pad]
      links:(M, 8)  i32 [first, count, miss, pad...]
      tri:  (F, 16) f32 [p0.xyz, ea.xyz, ed.xyz, valid, pad...]
      bounds: (1, 2) SMEM [t_min, t_max]
    """
    t_min = bounds[0, 0]
    t_max = bounds[0, 1]
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    eps = 1e-12
    inv_x = 1.0 / jnp.where(jnp.abs(d_x) < eps, jnp.where(d_x < 0, -eps, eps), d_x)
    inv_y = 1.0 / jnp.where(jnp.abs(d_y) < eps, jnp.where(d_y < 0, -eps, eps), d_y)
    inv_z = 1.0 / jnp.where(jnp.abs(d_z) < eps, jnp.where(d_z < 0, -eps, eps), d_z)

    def tri_test(f_idx, best):
        bt, btri, bb_, bg = best
        row = tri[pl.ds(f_idx, 1), :]        # (1, 16)
        p0x, p0y, p0z = row[0, 0], row[0, 1], row[0, 2]
        ax, ay, az = row[0, 3], row[0, 4], row[0, 5]
        ddx, ddy, ddz = row[0, 6], row[0, 7], row[0, 8]
        tvalid = row[0, 9]

        j = p0x - o_x
        k = p0y - o_y
        l = p0z - o_z
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
        ok = (
            (beta >= 0.0) & (beta < 1.0) & (gamma > 0.0) & (beta + gamma < 1.0)
            & (t >= t_min) & (t <= t_max) & (tvalid > 0.0) & (t < bt)
        )
        return (
            jnp.where(ok, t, bt),
            jnp.where(ok, f_idx, btri),
            jnp.where(ok, beta, bb_),
            jnp.where(ok, gamma, bg),
        )

    def body(state):
        node, bt, btri, bb_, bg = state
        nrow = bb[pl.ds(node, 1), :]         # (1, 8)
        lox, loy, loz = nrow[0, 0], nrow[0, 1], nrow[0, 2]
        hix, hiy, hiz = nrow[0, 3], nrow[0, 4], nrow[0, 5]
        ta_x = (lox - o_x) * inv_x
        tb_x = (hix - o_x) * inv_x
        ta_y = (loy - o_y) * inv_y
        tb_y = (hiy - o_y) * inv_y
        ta_z = (loz - o_z) * inv_z
        tb_z = (hiz - o_z) * inv_z
        t_near = jnp.maximum(jnp.maximum(jnp.minimum(ta_x, tb_x),
                                         jnp.minimum(ta_y, tb_y)),
                             jnp.minimum(ta_z, tb_z))
        t_far = jnp.minimum(jnp.minimum(jnp.maximum(ta_x, tb_x),
                                        jnp.maximum(ta_y, tb_y)),
                            jnp.maximum(ta_z, tb_z))
        lane_hit = (t_near <= t_far) & (t_far >= t_min) & (t_near < bt)
        any_hit = jnp.any(lane_hit)

        lrow = links[pl.ds(node, 1), :]
        first = lrow[0, 0]
        count = lrow[0, 1]
        miss = lrow[0, 2]
        is_leaf = count > 0

        def do_leaf(best):
            for s in range(LEAF_SIZE):
                best = tri_test(first + s, best)
            return best

        bt, btri, bb_, bg = jax.lax.cond(
            any_hit & is_leaf, do_leaf, lambda b: b, (bt, btri, bb_, bg)
        )
        node = jnp.where(any_hit & (~is_leaf), node + 1, miss)
        return node, bt, btri, bb_, bg

    def cond(state):
        return state[0] < n_nodes

    init = (
        jnp.asarray(0, jnp.int32),
        jnp.full((TILE_R, 1), BIG, jnp.float32),
        jnp.zeros((TILE_R, 1), jnp.int32),
        jnp.zeros((TILE_R, 1), jnp.float32),
        jnp.zeros((TILE_R, 1), jnp.float32),
    )
    _, bt, btri, bb_, bg = jax.lax.while_loop(cond, body, init)
    t_out[:] = bt
    tri_out[:] = btri
    beta_out[:] = bb_
    gamma_out[:] = bg


@functools.partial(jax.jit, static_argnames=("interpret",))
def bvh_traverse(origin_xyz, dir_xyz, bb_packed, links_packed, tri_packed,
                 t_min, t_max, interpret: bool = False):
    """-> (t, tri_idx, beta, gamma), each (N,). Caller pads N to TILE_R.

    bb_packed (M,8) f32, links_packed (M,8) i32, tri_packed (F,16) f32 — see
    geometry/triangles.pack_for_pallas."""
    ox, oy, oz = origin_xyz
    dx, dy, dz = dir_xyz
    n = ox.shape[0]
    assert n % TILE_R == 0, n
    m = bb_packed.shape[0]

    col = lambda a: a.reshape(-1, 1)
    bounds = jnp.asarray([[t_min, t_max]], jnp.float32)

    ray_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    t, tri_idx, beta, gamma = pl.pallas_call(
        functools.partial(_kernel, n_nodes=m),
        grid=(n // TILE_R,),
        in_specs=[ray_spec] * 6 + [full(bb_packed), full(links_packed),
                                   full(tri_packed),
                                   pl.BlockSpec((1, 2), lambda i: (0, 0),
                                                memory_space=pltpu.SMEM)],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(
        col(ox), col(oy), col(oz), col(dx), col(dy), col(dz),
        bb_packed, links_packed, tri_packed, bounds,
    )
    return t[:, 0], tri_idx[:, 0], beta[:, 0], gamma[:, 0]
