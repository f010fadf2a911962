"""Supertile-local ray binning WITHOUT gathers (MXU one-hot permutation).

Divergent bounce packets are the packed traversal kernel's cost driver: a
128-ray packet sweeps the UNION of its rays' admitted leaf blocks (measured
55 of 116 blocks shuffled vs 2.5 coherent on the 9.6k-tri mesh). A global
octant argsort + gathers was measured a net LOSS end-to-end (0.90 vs 1.15
Mrays/s): XLA lowers the 13-field gathers to serialized loads.

This module reorders rays WITHIN fixed 1024-lane supertiles (= one kernel
grid program) using only cumsum + two batched one-hot matmuls — no gather
anywhere, and the permutation matrix rides the MXU:

  1. key per lane (root-box miss/dead rays -> last bin; hits binned by the
     octant of their root-box ENTRY POINT, which tracks which subtree of
     the mesh they can touch better than direction alone);
  2. stable counting sort inside each supertile: dest = base[key] +
     rank-within-key, both from one cumsum over the supertile axis;
  3. permute = (G, B, B) one-hot P applied as a batched matmul
     (HIGHEST precision: products are exactly 0 or the field value, so the
     permutation is bit-exact); traversal outputs are un-permuted with the
     transpose contraction of the same P.

Cost: building + applying P twice is ~0.8 GB of HBM traffic per traversal
call at 64k lanes — ~1 ms — against a divergent-packet kernel cost of
~22 ms per integrator iteration. Dead/missing rays compact to the tail,
so whole trailing packets skip traversal via the kernel's root test.

Replaces (in effect) the ray-reordering the reference never needed: its
per-thread recursive traversal (src/hittable/collection/bvh.rs:173-192)
is immune to packet divergence but does ~100x more scalar node tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import os

# Supertile size: lanes sorted together. Must be a multiple of the kernel
# packet (128); callers pad ray batches to a multiple of B. Perf-probe env
# knob, captured at import (bench A/Bs run per-config subprocesses):
# larger B = more sorting freedom (purer packets), P traffic grows
# linearly in B. r5 same-session sweep on mesh+arealight:
# 1024 -> 1.47, 2048 -> 1.58, 4096 -> 1.64 Mrays/s (+11%); mesh-200k
# 2048 -> +3%. Default = 4096 (measured best).
B = int(os.environ.get("RAYSNAIL_BIN_B", "4096"))
N_KEYS = 9  # 8 entry/dir octants + 1 miss/dead bin

# bins per mode (miss/dead bin is always the last key)
MODE_KEYS = {"miss": 2, "dir": 9, "entry": 9, "entrydir": 65}

_HI = jax.lax.Precision.HIGHEST


def keys(ox, oy, oz, dx, dy, dz, cap, root_bb, t_min, mode: str):
    """Per-lane bin key in [0, N_KEYS). root_bb: (6,) [min.xyz, max.xyz].

    mode "entry": octant (relative to the root-box center) of the point
    where the ray enters the root box — rays entering the same region of
    the mesh tend to admit the same subtrees. mode "dir": direction octant.
    mode "miss": single live bin (pure dead/miss compaction)."""
    eps = 1e-12
    safe = lambda d: jnp.where(jnp.abs(d) < eps,
                               jnp.where(d < 0, -eps, eps), d)
    ix, iy, iz = 1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz)
    tx0 = (root_bb[0] - ox) * ix
    tx1 = (root_bb[3] - ox) * ix
    ty0 = (root_bb[1] - oy) * iy
    ty1 = (root_bb[4] - oy) * iy
    tz0 = (root_bb[2] - oz) * iz
    tz1 = (root_bb[5] - oz) * iz
    near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                   jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                  jnp.maximum(ty0, ty1)),
                      jnp.maximum(tz0, tz1))
    live = (cap > 0.0) & (near <= far) & (far >= t_min) & (near <= cap)
    nk = MODE_KEYS[mode]
    if mode == "miss":
        return jnp.where(live, 0, nk - 1).astype(jnp.int32)
    d8 = ((dx < 0).astype(jnp.int32) * 4 + (dy < 0).astype(jnp.int32) * 2
          + (dz < 0).astype(jnp.int32))
    if mode == "dir":
        o8 = d8
    else:  # entry / entrydir
        te = jnp.maximum(near, 0.0)
        cx = 0.5 * (root_bb[0] + root_bb[3])
        cy = 0.5 * (root_bb[1] + root_bb[4])
        cz = 0.5 * (root_bb[2] + root_bb[5])
        o8 = ((ox + dx * te > cx).astype(jnp.int32) * 4
              + ((oy + dy * te > cy).astype(jnp.int32)) * 2
              + (oz + dz * te > cz).astype(jnp.int32))
        if mode == "entrydir":
            o8 = o8 * 8 + d8
    return jnp.where(live, o8, nk - 1).astype(jnp.int32)


def perm(key, n_keys: int = N_KEYS):
    """Stable counting sort of each B-lane supertile by key -> one-hot
    permutation P (G, B, B) f32 with P[g, i, j] = (dest of lane i == j)."""
    n = key.shape[0]
    assert n % B == 0, n
    k2 = key.reshape(-1, B)                                    # (G, B)
    oh = (k2[:, :, None] == jnp.arange(n_keys)[None, None, :]).astype(
        jnp.float32)                                           # (G, B, K)
    pref = jnp.cumsum(oh, axis=1)                              # incl. rank
    tot = pref[:, -1, :]                                       # (G, K)
    base = jnp.cumsum(tot, axis=1) - tot                       # excl. base
    rank = jnp.sum(pref * oh, axis=2)                          # (G, B)
    basel = jnp.sum(base[:, None, :] * oh, axis=2)             # (G, B)
    dest = basel + rank - 1.0
    return (dest[:, :, None]
            == jnp.arange(B, dtype=jnp.float32)[None, None, :]).astype(
                jnp.float32)


def apply(p, fields):
    """fields: list of (N,) -> list of (N,) permuted (sorted[j] = x[dest^-1(j)])."""
    x = jnp.stack([jnp.asarray(f, jnp.float32) for f in fields], axis=-1)
    x = x.reshape(p.shape[0], B, -1)
    y = jax.lax.dot_general(p, x, (((1,), (1,)), ((0,), (0,))),
                            precision=_HI)                     # (G, B, F)
    y = y.reshape(-1, len(fields))
    return [y[:, i] for i in range(len(fields))]


def unapply(p, fields):
    """Inverse permutation of `apply` (transpose contraction of the same P)."""
    x = jnp.stack([jnp.asarray(f, jnp.float32) for f in fields], axis=-1)
    x = x.reshape(p.shape[0], B, -1)
    y = jax.lax.dot_general(p, x, (((2,), (1,)), ((0,), (0,))),
                            precision=_HI)                     # (G, B, F)
    y = y.reshape(-1, len(fields))
    return [y[:, i] for i in range(len(fields))]
