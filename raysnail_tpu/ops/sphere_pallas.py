"""Pallas TPU kernel: fused ray-sphere intersection + min-t arg-reduction.

The jnp path (geometry/spheres.py) computes the (rays x spheres) pairwise t
matrix and relies on XLA to fuse it into the min/argmin reductions; this
kernel guarantees the fusion: rays ride the SUBLANE axis of a (TILE_R, 1)
block, spheres ride the LANE axis in 128-wide chunks, the (TILE_R, 128)
pairwise tile lives entirely in VMEM/registers, and only the per-ray winner
(t, index) ever reaches HBM. Sphere parameters (a few KB) are replicated to
every grid step's VMEM.

Used when RenderConfig.use_pallas resolves on an accelerator backend;
off-accelerator tests run it with interpret=True against the jnp reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raysnail_tpu.geometry.hit import BIG

TILE_R = 512     # rays per grid step (sublane axis)
LANES = 128      # spheres per chunk (lane axis)


def _kernel(ox, oy, oz, dx, dy, dz, scx, scy, scz, sr2, sact, bounds,
            t_out, idx_out, *, n_chunks: int):
    t_min = bounds[0, 0]
    t_max = bounds[0, 1]
    o_x, o_y, o_z = ox[:], oy[:], oz[:]          # (TILE_R, 1)
    d_x, d_y, d_z = dx[:], dy[:], dz[:]

    best_t = jnp.full((TILE_R, 1), BIG, jnp.float32)
    best_i = jnp.zeros((TILE_R, 1), jnp.int32)

    for c in range(n_chunks):
        sl = pl.ds(c * LANES, LANES)
        cx = scx[:, sl]                          # (1, LANES)
        cy = scy[:, sl]
        cz = scz[:, sl]
        r2 = sr2[:, sl]
        act = sact[:, sl]

        lx = o_x - cx                            # (TILE_R, LANES)
        ly = o_y - cy
        lz = o_z - cz
        half_b = d_x * lx + d_y * ly + d_z * lz
        cc = lx * lx + ly * ly + lz * lz - r2
        delta = half_b * half_b - cc
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        t1 = -half_b - sq
        t2 = -half_b + sq
        ok = (delta > 0.0) & (act > 0.0)
        in1 = ok & (t_min < t1) & (t1 < t_max)
        in2 = ok & (t_min < t2) & (t2 < t_max)
        t = jnp.where(in1, t1, jnp.where(in2, t2, BIG))

        tc = jnp.min(t, axis=1, keepdims=True)                  # (TILE_R, 1)
        ic = jnp.argmin(t, axis=1).reshape(TILE_R, 1).astype(jnp.int32)
        take = tc < best_t
        best_t = jnp.where(take, tc, best_t)
        best_i = jnp.where(take, ic + c * LANES, best_i)

    t_out[:] = best_t
    idx_out[:] = best_i


@functools.partial(jax.jit, static_argnames=("interpret",))
def sphere_min_t(origin_xyz, dir_xyz, center_xyz, r2, active, t_min, t_max,
                 interpret: bool = False):
    """-> (t_best (N,), idx_best (N,)). N padded to TILE_R and sphere count
    padded to LANES by the caller (geometry/spheres.py)."""
    ox, oy, oz = origin_xyz
    dx, dy, dz = dir_xyz
    cx, cy, cz = center_xyz
    n = ox.shape[0]
    s = cx.shape[0]
    assert n % TILE_R == 0 and s % LANES == 0, (n, s)
    n_chunks = s // LANES

    col = lambda a: a.reshape(-1, 1)
    row = lambda a: a.reshape(1, -1)
    bounds = jnp.asarray([[t_min, t_max]], jnp.float32)

    ray_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sph_spec = pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bounds_spec = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)

    t_best, idx_best = pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks),
        grid=(n // TILE_R,),
        in_specs=[ray_spec] * 6 + [sph_spec] * 5 + [bounds_spec],
        out_specs=(
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        col(ox), col(oy), col(oz), col(dx), col(dy), col(dz),
        row(cx), row(cy), row(cz), row(r2),
        row(active.astype(jnp.float32)), bounds,
    )
    return t_best[:, 0], idx_best[:, 0]
