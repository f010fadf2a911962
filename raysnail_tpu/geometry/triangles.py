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
    # packed layouts for the pallas packet-traversal kernel (ops/bvh_pallas):
    # a second, fat-leaf BVH whose blocks carry geometry + vertex normals +
    # material id so the kernel finishes hits without any XLA gathers
    pk_bb: jax.Array | None = None     # (M2, 8) f32
    pk_links: jax.Array | None = None  # (M2, 4) i32
    pk_tri: jax.Array | None = None    # (B, NF_TRI, LANES) f32
    pk_cbb: jax.Array | None = None    # (K, 64, 8) f32 two-level coarse cut
    pk_crange: jax.Array | None = None # (K, 64, 4) i32 [start, end) ranges


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


def intersect_brute(group: TriangleGroup, ray, t_min, t_max,
                    chunk: int = 256) -> Hit:
    """Dense chunked triangle sweep — no BVH, no gathers.

    TPU XLA serializes the lockstep BVH walk's per-ray node fetches, so up to
    a few tens of thousands of triangles a (rays x chunk) broadcast test with
    scalar per-chunk triangle data is far faster on the VPU (the same pattern
    as the sphere group). Scene compile picks this path for small/medium
    meshes (BRUTE_FORCE_MAX) and keeps the BVH for large ones."""
    n = jnp.shape(ray.direction.x)[0]
    f = group.mat_id.shape[0]
    o = ray.origin.map(lambda a: a[:, None])
    d = ray.direction.map(lambda a: a[:, None])

    n_chunks = -(-f // chunk)
    pad = n_chunks * chunk - f

    def padded(a):
        return jnp.pad(a, (0, pad)) if pad else a

    p0 = group.p0.map(padded)
    A = group.edge_a.map(padded)
    D = group.edge_d.map(padded)
    mat = jnp.pad(group.mat_id, (0, pad), constant_values=-2) if pad else group.mat_id

    def reshaped(v):
        return v.map(lambda a: a.reshape(n_chunks, chunk))

    p0c, Ac, Dc = reshaped(p0), reshaped(A), reshaped(D)
    matc = mat.reshape(n_chunks, chunk)

    def body(carry, xs):
        bt, btri, bb, bg, base = carry
        p0_, A_, D_, m_ = xs
        p0r = p0_.map(lambda a: a[None, :])
        Ar = A_.map(lambda a: a[None, :])
        Dr = D_.map(lambda a: a[None, :])

        j = p0r.x - o.x
        k = p0r.y - o.y
        l = p0r.z - o.z
        eihf = Dr.y * d.z - d.y * Dr.z
        gfdi = d.x * Dr.z - Dr.x * d.z
        dheg = Dr.x * d.y - Dr.y * d.x
        denom = Ar.x * eihf + Ar.y * gfdi + Ar.z * dheg
        denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        beta = (j * eihf + k * gfdi + l * dheg) / denom
        akjb = Ar.x * k - j * Ar.y
        jcal = j * Ar.z - Ar.x * l
        blkc = Ar.y * l - k * Ar.z
        gamma = (d.z * akjb + d.y * jcal + d.x * blkc) / denom
        t = -(Dr.z * akjb + Dr.y * jcal + Dr.x * blkc) / denom
        ok = (
            (beta >= 0.0) & (beta < 1.0) & (gamma > 0.0) & (beta + gamma < 1.0)
            & (t >= t_min) & (t <= t_max) & (m_[None, :] != -2)
        )
        t = jnp.where(ok, t, BIG)
        tc = jnp.min(t, axis=1)
        onehot = hitlib.onehot_of(jnp.argmin(t, axis=1), chunk)
        take = tc < bt
        bt = jnp.where(take, tc, bt)
        btri = jnp.where(take, hitlib.select_row(
            onehot, jnp.broadcast_to(jnp.arange(chunk, dtype=jnp.int32)[None, :], t.shape)
        ) + base, btri)
        bb = jnp.where(take, hitlib.select_row(onehot, beta), bb)
        bg = jnp.where(take, hitlib.select_row(onehot, gamma), bg)
        return (bt, btri, bb, bg, base + chunk), None

    init = (
        jnp.full(n, BIG, d.x.dtype),
        jnp.zeros(n, jnp.int32),
        jnp.zeros(n, d.x.dtype),
        jnp.zeros(n, d.x.dtype),
        jnp.asarray(0, jnp.int32),
    )
    (best_t, best_tri, beta, gamma, _), _ = jax.lax.scan(
        body, init, (p0c, Ac, Dc, matc)
    )
    return _finish(group, ray, best_t, best_tri, beta, gamma)


def _finish(group: TriangleGroup, ray, best_t, best_tri, beta, gamma) -> Hit:
    valid = best_t < BIG
    n0 = hitlib.gather(group.n0, best_tri)
    n1 = hitlib.gather(group.n1, best_tri)
    n2 = hitlib.gather(group.n2, best_tri)
    normal = (n0 * (1.0 - beta - gamma) + n1 * beta + n2 * gamma).unit()
    mat_id = group.mat_id[best_tri]
    z = jnp.zeros_like(best_t)
    t = jnp.where(valid, best_t, BIG)
    # with_normal semantics: normal as given, outside = true
    return Hit(
        t=t, valid=valid, normal=normal, u=z, v=z,
        mat_id=jnp.where(valid, mat_id, -1).astype(jnp.int32),
        outside=jnp.ones_like(valid),
    )


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
    return _finish(group, ray, best_t, best_tri, beta, gamma)


def intersect_pallas(group: TriangleGroup, ray, t_min, t_max,
                     active=None, t_cap=None, interpret: bool = False,
                     sort_rays: bool = False, bin_mode: str = "never") -> Hit:
    """Packet BVH traversal on the TPU (ops/bvh_pallas.py v4): normals and
    material ids come back from the kernel itself, so no per-ray gathers
    remain on this path.

    `active` is the integrator's alive mask: dead lanes neither admit BVH
    nodes nor loosen packet termination. `t_cap` is the best hit distance
    already found in cheaper primitive groups — traversal never admits a
    node beyond it. sort_rays additionally groups rays into packets by
    direction octant (stable, so already-coherent primary packets are
    preserved). bin_mode != "never" instead reorders rays WITHIN 1024-lane
    supertiles by a coherence key via gather-free one-hot MXU permutations
    (ops/binning.py) — root-box-missing and dead lanes compact to the tail
    so trailing packets skip traversal entirely."""
    from raysnail_tpu.ops import binning, bvh_pallas

    n = jnp.shape(ray.direction.x)[0]
    ox, oy, oz = ray.origin.x, ray.origin.y, ray.origin.z
    dx, dy, dz = ray.direction.x, ray.direction.y, ray.direction.z
    cap = (jnp.full(n, BIG, jnp.float32) if t_cap is None
           else jax.lax.stop_gradient(jnp.asarray(t_cap, jnp.float32)))
    if active is not None:
        cap = jnp.where(active, cap, -1.0)

    order = None
    if sort_rays:
        octant = (
            (dx < 0).astype(jnp.int32) * 4
            + (dy < 0).astype(jnp.int32) * 2
            + (dz < 0).astype(jnp.int32)
        )
        order = jnp.argsort(octant, stable=True)
        take = lambda a: jnp.take(a, order)
        ox, oy, oz, dx, dy, dz, cap = map(take, (ox, oy, oz, dx, dy, dz, cap))

    padq = bvh_pallas.TILE_R
    if bin_mode != "never":
        # binning sorts within B-lane supertiles: pad to a common multiple
        # (extra lanes are dead -> compact to the tail -> packets skip)
        assert binning.B % padq == 0 or padq % binning.B == 0, binning.B
        padq = max(padq, binning.B)
    pad = (-n) % padq

    def p(a):
        return jnp.pad(a, (0, pad)) if pad else a

    pox, poy, poz = p(ox), p(oy), p(oz)
    pdx, pdy, pdz = p(dx), p(dy), p(dz)
    pcap = p(cap)
    P = None
    if bin_mode != "never":
        assert order is None, "sort_rays and bin_mode are exclusive"
        root_bb = group.pk_bb[0, 0, :6]
        kb = binning.keys(pox, poy, poz, pdx, pdy, pdz, pcap, root_bb,
                          t_min, bin_mode)
        P = binning.perm(kb, binning.MODE_KEYS[bin_mode])
        pox, poy, poz, pdx, pdy, pdz, pcap = binning.apply(
            P, [pox, poy, poz, pdx, pdy, pdz, pcap])

    # block lane width identifies the pack format (scene._pack_mxu_blocks
    # vs _pack_leaf_blocks): 640 = MXU one-matmul solve, 128 = VPU Cramer
    kind = "tri_mxu" if group.pk_tri.shape[2] == bvh_pallas.MXU_LANES else "tri"
    t, nx, ny, nz, _, mat = bvh_pallas.bvh_traverse(
        (pox, poy, poz), (pdx, pdy, pdz), pcap,
        group.pk_bb, group.pk_links, group.pk_tri,
        jnp.float32(t_min), jnp.float32(t_max), kind=kind,
        interpret=interpret,
        cbb=group.pk_cbb, crange=group.pk_crange,
    )
    if P is not None:
        # misses carry t = BIG: exact under the one-hot matmul (0 + BIG)
        t, nx, ny, nz, matf = binning.unapply(
            P, [t, nx, ny, nz, mat.astype(jnp.float32)])
        mat = jnp.round(matf).astype(jnp.int32)
    t, nx, ny, nz, mat = t[:n], nx[:n], ny[:n], nz[:n], mat[:n]
    if order is not None:
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(n, dtype=order.dtype))
        take = lambda a: jnp.take(a, inv)
        t, nx, ny, nz, mat = map(take, (t, nx, ny, nz, mat))

    valid = t < BIG * 0.5
    # miss lanes carry zero normals; keep unit() NaN-free
    normal = Vec3(nx, ny, jnp.where(valid, nz, 1.0)).unit()
    z = jnp.zeros_like(t)
    # with_normal semantics: normal as given, outside = true
    return Hit(
        t=jnp.where(valid, t, BIG), valid=valid, normal=normal, u=z, v=z,
        mat_id=jnp.where(valid, mat, -1).astype(jnp.int32),
        outside=jnp.ones_like(valid),
    )
