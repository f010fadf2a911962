"""Triangle meshes: SoA storage + stackless lockstep BVH traversal.

Triangle test replicates the reference's Cramer's-rule barycentric solve with
precomputed edge coefficients (src/hittable/geometry/triangle_mesh.rs:41-60,
85-131): beta in [0,1), gamma in (0,1), beta+gamma < 1, smooth normal =
barycentric blend of vertex normals used AS GIVEN (HitRecord::with_normal
sets outside=true without ray-facing flip), uv = (0,0).

Traversal: all rays advance in lockstep through the skip-link BVH
(accel/bvh.py) inside one lax.while_loop; a leaf visit tests a fixed
LEAF_SIZE block of triangles via gathers. No recursion, no stacks, static
shapes — the TPU replacement for bvh.rs:173-192.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raysnail_tpu.accel.bvh import LEAF_SIZE
from raysnail_tpu.geometry import hit as hitlib
from raysnail_tpu.geometry.hit import BIG, Hit
from raysnail_tpu.prelude.vec import Vec3


class TriangleGroup(NamedTuple):
    # per-triangle data, already reordered into BVH leaf order and padded
    # (degenerate entries have mat_id == -2)
    p0: Vec3            # (F,)
    edge_a: Vec3        # p0 - p1 (the reference's a,b,c)
    edge_d: Vec3        # p0 - p2 (the reference's d,e,f)
    n0: Vec3            # vertex normals
    n1: Vec3
    n2: Vec3
    mat_id: jax.Array   # (F,) int32; -2 for padding
    # flat BVH
    bb_min: Vec3        # (M,)
    bb_max: Vec3        # (M,)
    first: jax.Array    # (M,) int32
    count: jax.Array    # (M,) int32 (0 interior, LEAF_SIZE leaf)
    miss: jax.Array     # (M,) int32


def _tri_hit(g: TriangleGroup, tri_idx, o: Vec3, d: Vec3, t_min, t_max):
    """Batched Cramer's-rule solve for gathered triangle indices
    (triangle_mesh.rs:85-131). Returns (t, beta, gamma, valid)."""
    p0 = hitlib.gather(g.p0, tri_idx)
    A = hitlib.gather(g.edge_a, tri_idx)
    D = hitlib.gather(g.edge_d, tri_idx)

    j = p0.x - o.x
    k = p0.y - o.y
    l = p0.z - o.z

    eihf = D.y * d.z - d.y * D.z
    gfdi = d.x * D.z - D.x * d.z
    dheg = D.x * d.y - D.y * d.x
    denom = A.x * eihf + A.y * gfdi + A.z * dheg
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    beta = (j * eihf + k * gfdi + l * dheg) / denom

    akjb = A.x * k - j * A.y
    jcal = j * A.z - A.x * l
    blkc = A.y * l - k * A.z
    gamma = (d.z * akjb + d.y * jcal + d.x * blkc) / denom
    t = -(D.z * akjb + D.y * jcal + D.x * blkc) / denom

    valid = (
        (beta >= 0.0) & (beta < 1.0)
        & (gamma > 0.0) & (beta + gamma < 1.0)
        & (t >= t_min) & (t <= t_max)
        & (hitlib.gather(g.mat_id, tri_idx) != -2)
    )
    return t, beta, gamma, valid


def intersect(group: TriangleGroup, ray, t_min, t_max,
              max_iters: int = 4096) -> Hit:
    o, d = ray.origin, ray.direction
    n = jnp.shape(d.x)[0]
    n_nodes = group.first.shape[0]
    END = n_nodes

    inv_d = d.map(lambda c: 1.0 / jnp.where(jnp.abs(c) < 1e-12,
                                            jnp.where(c < 0, -1e-12, 1e-12), c))

    def box_hit(node, best_t):
        lo = hitlib.gather(group.bb_min, node)
        hi = hitlib.gather(group.bb_max, node)
        ta = (lo - o) * inv_d
        tb = (hi - o) * inv_d
        t_near = Vec3(jnp.minimum(ta.x, tb.x), jnp.minimum(ta.y, tb.y),
                      jnp.minimum(ta.z, tb.z)).max_component()
        t_far = Vec3(jnp.maximum(ta.x, tb.x), jnp.maximum(ta.y, tb.y),
                     jnp.maximum(ta.z, tb.z)).min_component()
        return (t_near <= t_far) & (t_far >= t_min) & (t_near < best_t)

    def body(state):
        node, best_t, best_tri, best_b, best_g, it = state
        live = node < END
        node_c = jnp.minimum(node, END - 1)

        hit_box = box_hit(node_c, best_t) & live
        cnt = group.count[node_c]
        is_leaf = cnt > 0
        do_leaf = hit_box & is_leaf

        first = group.first[node_c]
        bt, btri, bb, bg = best_t, best_tri, best_b, best_g
        for s in range(LEAF_SIZE):
            tri = first + s
            t, beta, gamma, ok = _tri_hit(group, tri, o, d, t_min, t_max)
            take = do_leaf & ok & (t < bt)
            bt = jnp.where(take, t, bt)
            btri = jnp.where(take, tri, btri)
            bb = jnp.where(take, beta, bb)
            bg = jnp.where(take, gamma, bg)

        descend = hit_box & (~is_leaf)
        nxt = jnp.where(descend, node_c + 1, group.miss[node_c])
        node = jnp.where(live, nxt, node)
        return node, bt, btri, bb, bg, it + 1

    def cond(state):
        node, _, _, _, _, it = state
        return jnp.any(node < END) & (it < max_iters)

    init = (
        jnp.zeros(n, jnp.int32),
        jnp.full(n, BIG, d.x.dtype),
        jnp.zeros(n, jnp.int32),
        jnp.zeros(n, d.x.dtype),
        jnp.zeros(n, d.x.dtype),
        jnp.asarray(0, jnp.int32),
    )
    node, best_t, best_tri, beta, gamma, _ = jax.lax.while_loop(cond, body, init)

    valid = best_t < BIG
    n0 = hitlib.gather(group.n0, best_tri)
    n1 = hitlib.gather(group.n1, best_tri)
    n2 = hitlib.gather(group.n2, best_tri)
    normal = n0 * (1.0 - beta - gamma) + n1 * beta + n2 * gamma
    mat_id = group.mat_id[best_tri]
    z = jnp.zeros_like(best_t)
    # with_normal semantics: normal as given, outside = true
    t = jnp.where(valid, best_t, BIG)
    return Hit(
        t=t, valid=valid, normal=normal, u=z, v=z,
        mat_id=jnp.where(valid, mat_id, -1).astype(jnp.int32),
        outside=jnp.ones_like(valid),
    )
