"""Pallas TPU kernel: BVH traversal with fused hit finishing (v4).

One 128-ray PACKET is traversed at a time, rays on SUBLANES (128, 1):

  * ray I/O is ONE packed (8, 128) row block per packet — fields on
    sublanes: [ox oy oz dx dy dz t_cap pad] — so each packet costs a single
    contiguous 4 KB DMA plus one in-register transpose, not 7 strided
    column DMAs; outputs pack the same way ([t a0..a4 pad pad]);
  * grid programs own G packets each and loop over them, amortizing
    per-program overhead;
  * node tests are EXACT per-ray slab tests ((128,1) vector ops against
    scalar node bounds read from SMEM) reduced to one any() decision;
  * every ray carries a shrinking admission cap
    min(best_t, root_exit, t_cap): rays that already found a close hit
    (here, or in a cheaper primitive group — t_cap), rays that exit the
    root box early, and rays the integrator marked dead stop admitting
    nodes, so traversal terminates without any global ordering;
  * a hit leaf is swept inline (lax.cond): the 128-wide primitive block —
    fields on sublanes, primitives on lanes, (B, NF, 128), 12 KB/block with
    no lane padding — broadcasts against the ray column into a
    (128 ray, 128 prim) solve, min-reduced over lanes (~0.45 us/leaf);
  * the winner's shading attributes (blended vertex normal + material for
    triangles; center/radius/material for spheres) are selected INSIDE the
    sweep, so the caller needs no per-ray dynamic gathers at all (XLA
    lowers those to serialized loads — measured as slow as the whole v3
    traversal).

History: v1/v2 carried per-ray state in (N,1) column layout (vreg spills);
v3 split a conservative scalar interval walk from a fat vectorized sweep —
correct but admitted far too many leaves (1.96 Mrays/s on fully coherent
primaries) and paid an XLA gather finisher on top.

Replaces the reference's recursive traversal (src/hittable/collection/
bvh.rs:173-192), AABB slab test (src/prelude/aabb.rs:20-38), and the hit
finishing in triangle_mesh.rs:115-131 / sphere.rs:64-71.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raysnail_tpu.geometry.hit import BIG

LANES = 128          # primitives per leaf block == VPU lane count
PACKET = 128         # rays per packet, on sublanes
GROUP = 8            # packets per grid program
TILE_R = GROUP * PACKET  # rays per program (caller pads to this)

# leaf-block field rows (tri kind, NF_TRI sublanes):
#   0-2 p0.xyz | 3-5 (p0-p1).xyz | 6-8 (p0-p2).xyz | 9 valid
#   10-12 n0 | 13-15 n1 | 16-18 n2 | 19 material id (f32) | 20-23 pad
NF_TRI = 24
# sphere kind: 0-2 center | 3 r^2 | 4 valid | 5 material id | 6 r | 7 pad
NF_SPH = 8
# box kind (axis-aligned): 0-2 p_min | 3-5 p_max | 6 valid | 7 material id
NF_BOX = 8
# tri_mxu kind: blocks are (B, 16, 640) — lanes 0:512 hold the SOLVE table
# F (rows 0-9; one (128,16)x(16,512) matmul yields denom | n.o-n.p0 |
# beta_num | gamma_num for all 128 rays x 128 tris), lanes 512:640 the attr
# table (0 valid | 1 mat | 2-4 n0 | 5-7 n1 | 8-10 n2). The Cramer solve's
# ~55 VPU ops per sweep collapse into one MXU call + a ~20-op epilogue;
# derivation: denom = d.n, t_num = n.p0 - n.o, beta_num = d.(p0 x dd) +
# (o x d).dd, gamma_num = d.(a x p0) - (o x d).a  (triple-product identities
# of triangle_mesh.rs:85-131's Cramer form; a = p0-p1, dd = p0-p2, n = a x dd)
NF_MXU = 16
MXU_LANES = 640


import os

# admitted leaf blocks buffered per walk segment (env knob for perf probes)
CHUNK = int(os.environ.get("RAYSNAIL_BVH_CHUNK", "8"))
_NOATTR = os.environ.get("RAYSNAIL_BVH_NOATTR") == "1"   # perf probe only
_NOSWEEP = os.environ.get("RAYSNAIL_BVH_NOSWEEP") == "1"  # perf probe only
# nodes tested per walk iteration (sublane-aligned VMEM window). Each window
# costs one packed-bits vector->scalar transfer; wider windows amortize that
# transfer over more nodes at the price of testing more nodes speculatively
# past skip jumps. Env knob for perf probes (the walk dominates divergent
# mesh packets — BASELINE.md round-5 split).
# r5 same-session A/B on the 200k-tri mesh (kernel-only): WIN=16 read
# primary 6.86 vs 7.22 ms and bounce1 27.5 vs 29.7 ms (+5-8%) — one
# packed-bits transfer now covers 16 nodes. Default 16.
WIN = int(os.environ.get("RAYSNAIL_BVH_WIN", "16"))
# two-level walk: the coarse cut is always padded to exactly this many
# entries (8 aligned windows), so the kernel needs no per-scene static count
COARSE_MAX = 64


def _kernel(rays, bbv, links, prim, bounds, *refs, n_nodes: int,
            n_orders: int, kind: str, stream: bool, two_level: bool):
    """Refs:
      rays:  (GROUP, 8, PACKET) f32 — packed ray rows per packet:
             [ox oy oz dx dy dz t_cap pad]; t_cap <= 0 marks a dead lane
      bbv:   (K*M8, 8) f32 VMEM [min.xyz, max.xyz, pad, pad] per node — K = 8
             direction-octant front-to-back node orders (or 1), M8 = nodes
             rounded up to the WIN=8 window so every aligned (8, 8) window
             load is in bounds. The walk tests a WINDOW of 8 consecutive
             DFS-order nodes per iteration as one (8, 128) slab test — the
             single-node (1, 128) test occupied 1 of 8 sublanes, so 8 nodes
             now cost the vector work 1 used to (and one packed-bits
             scalar transfer instead of 8 jnp.any transfers)
      links: (K*M*4,) i32 SMEM [leaf_block, count, miss, pad] per node
      prim:  (B, NF, LANES) f32 VMEM leaf blocks
      bounds: (1, 2) f32 SMEM [t_min, t_max]
      out:   (GROUP, 8, PACKET) f32 — [t a0 a1 a2 a3 a4 pad pad]:
        tri:    a0-2 = blended (unnormalized) normal, a3 = 0, a4 = mat id
        sphere: a0-2 = center, a3 = radius, a4 = mat id
        box:    a0 = face axis, a1 = entry flag, a2-3 = face uv, a4 = mat id

    stream=True: `prim` lives in HBM (pl.ANY); admitted leaf blocks are
    DMA'd into a CHUNK-deep VMEM scratch ring (`vbuf`) — all of a walk
    segment's copies are issued back-to-back, then each sweep waits only on
    its own semaphore, so copy latency overlaps both the remaining issues
    and earlier sweeps. Lifts the whole-mesh VMEM-residency cap (~1.4M tris
    at 12 KB per 128-triangle block) to HBM capacity.

    two_level=True adds the COARSE cut refs (VERDICT r4 item 1):
      cbbv:   (K*COARSE_MAX, 8) f32 VMEM — cut-subtree-root bboxes in each
              octant's entry order; padding entries are empty boxes
      crange: (K*COARSE_MAX*4,) i32 SMEM — [start, end, pad, pad] DFS node
              ranges per entry
    The walk then becomes: vector-sweep the coarse windows to find the next
    admitted subtree (pure VPU slab tests + one packed-bits transfer per
    8-entry window), and run the serial link-resolution walk only INSIDE
    that subtree's [start, end) range — the scalar chase through the
    above-cut levels, paid per outer round by every packet, disappears.
    """
    if two_level:
        cbbv, crange, out, buf, *scratch = refs
    else:
        out, buf, *scratch = refs
    if stream:
        vbuf, sem = scratch
    t_min = bounds[0, 0]
    t_max = bounds[0, 1]
    m8 = (n_nodes + WIN - 1) // WIN * WIN
    row_i = jax.lax.broadcasted_iota(jnp.int32, (WIN, 1), 0)
    row_pw = (1 << row_i).astype(jnp.float32)  # bit weight per window row

    def packet(pidx, _):
        rows = rays[pl.ds(pidx, 1), :, :].reshape(8, PACKET)
        cols = jnp.transpose(rows, (1, 0))        # (PACKET, 8)
        o_x, o_y, o_z = cols[:, 0:1], cols[:, 1:2], cols[:, 2:3]
        d_x, d_y, d_z = cols[:, 3:4], cols[:, 4:5], cols[:, 5:6]
        t_cap = cols[:, 6:7]

        # LANE layout for the node walk: rays on lanes, (1, PACKET) rows
        # straight out of the packed block. A node slab test on (PACKET, 1)
        # columns costs 16 vregs per op at 1/128 lane occupancy; the same
        # test on (1, PACKET) rows is ONE vreg per op — ~16x less walk
        # vector work, bit-identical results (same op sequence per ray).
        # The leaf sweep keeps the column layout (it broadcasts rays against
        # 128 primitives on lanes).
        o_xl, o_yl, o_zl = rows[0:1, :], rows[1:2, :], rows[2:3, :]
        d_xl, d_yl, d_zl = rows[3:4, :], rows[4:5, :], rows[5:6, :]
        t_capl = rows[6:7, :]

        # pick the front-to-back node order by the packet's dominant octant
        if n_orders == 8:
            oct_ = ((jnp.sum(d_xl) < 0).astype(jnp.int32) * 4
                    + (jnp.sum(d_yl) < 0).astype(jnp.int32) * 2
                    + (jnp.sum(d_zl) < 0).astype(jnp.int32))
        else:
            oct_ = jnp.asarray(0, jnp.int32)
        bb_base = oct_ * m8
        lk_base = oct_ * (n_nodes * 4)
        eps = 1e-12
        inv = lambda d: 1.0 / jnp.where(jnp.abs(d) < eps,
                                        jnp.where(d < 0, -eps, eps), d)
        # lane-layout only: the column-layout inverses were dead weight
        # (3 predicated divides on (128,1) per packet, never read) — except
        # for the box kind, whose sweep slab-tests in column layout
        inv_xl, inv_yl, inv_zl = inv(d_xl), inv(d_yl), inv(d_zl)
        if kind == "box":
            ivc_x, ivc_y, ivc_z = inv(d_x), inv(d_y), inv(d_z)
        if kind == "tri_mxu":
            # per-packet ray feature matrix [d | o | o x d | 1 | 0...]
            cxx = o_y * d_z - o_z * d_y
            cxy = o_z * d_x - o_x * d_z
            cxz = o_x * d_y - o_y * d_x
            rayF = jnp.concatenate(
                [d_x, d_y, d_z, o_x, o_y, o_z, cxx, cxy, cxz,
                 jnp.ones_like(o_x)] + [jnp.zeros_like(o_x)] * 6,
                axis=1)                                   # (PACKET, 16)

        def slab_rows(win):
            """(WIN, 128) slab test of WIN node bboxes (rows of an aligned
            VMEM window) against the lane-layout ray rows — (WIN, 1) node
            bounds broadcast over lanes, full-sublane vector work."""
            x0, y0, z0 = win[:, 0:1], win[:, 1:2], win[:, 2:3]
            x1, y1, z1 = win[:, 3:4], win[:, 4:5], win[:, 5:6]
            ax0 = (x0 - o_xl) * inv_xl
            ax1 = (x1 - o_xl) * inv_xl
            ay0 = (y0 - o_yl) * inv_yl
            ay1 = (y1 - o_yl) * inv_yl
            az0 = (z0 - o_zl) * inv_zl
            az1 = (z1 - o_zl) * inv_zl
            near = jnp.maximum(jnp.maximum(jnp.minimum(ax0, ax1),
                                           jnp.minimum(ay0, ay1)),
                               jnp.minimum(az0, az1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(ax0, ax1),
                                          jnp.maximum(ay0, ay1)),
                              jnp.maximum(az0, az1))
            return near, far

        def slab_win(base):
            return slab_rows(bbv[pl.ds(base, WIN), :])

        # per-ray admission cap: nothing past the root-box exit, the best
        # hit of a cheaper primitive group (t_cap), or a dead lane.
        # The root is row 0 of the octant's first window.
        near_r, far_r = slab_win(bb_base)
        near0, far0 = near_r[0:1, :], far_r[0:1, :]
        cap_in = jnp.minimum(t_capl, t_max)
        can_hit = ((t_capl > 0.0) & (near0 <= far0) & (far0 >= t_min)
                   & (near0 <= cap_in))
        cap = jnp.where(can_hit,
                        jnp.minimum(far0, cap_in) * 1.0001 + 1e-4, -BIG)
        start = jnp.where(jnp.max(cap) >= t_min, 0, n_nodes).astype(jnp.int32)

        def sweep(m, st):
            # st: PACKED per-ray hit state (PACKET, 8) f32
            #   [best_t, a0, a1, a2, a3, a4, pad, pad]
            # — one (PACKET, 8) where() per sweep instead of six (PACKET, 1)
            # column updates (each column op costs the full 16 vregs).
            if _NOSWEEP:  # perf probe: walk + buffering cost only
                return st
            bt = st[:, 0:1]
            fld = lambda i: m[i:i + 1, :]                    # (1, LANES)
            if kind == "tri_mxu":
                # one MXU call solves all 4 quantities for 128x128 pairs
                out4 = jax.lax.dot_general(
                    rayF, m[:, 0:512], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)     # (PACKET, 512)
                den = out4[:, 0:128]
                den = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
                inv_den = 1.0 / den
                t = -out4[:, 128:256] * inv_den
                beta = out4[:, 256:384] * inv_den
                gamma = out4[:, 384:512] * inv_den
                ok = ((beta >= 0.0) & (beta < 1.0) & (gamma > 0.0)
                      & (beta + gamma < 1.0) & (t >= t_min) & (t <= t_max)
                      & (m[0:1, 512:640] > 0.0) & (t < bt))
            elif kind == "tri":
                # Cramer's-rule barycentric solve (triangle_mesh.rs:85-131):
                # (128 rays, 1) x (1, 128 tris) -> (128, 128)
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
            elif kind == "box":
                # slab interval per (ray, box); surface t is t_near if in
                # range else t_far (ray started inside — box.rs:131-134)
                tax = (fld(0) - o_x) * ivc_x
                tbx = (fld(3) - o_x) * ivc_x
                tay = (fld(1) - o_y) * ivc_y
                tby = (fld(4) - o_y) * ivc_y
                taz = (fld(2) - o_z) * ivc_z
                tbz = (fld(5) - o_z) * ivc_z
                lox = jnp.minimum(tax, tbx)
                hix = jnp.maximum(tax, tbx)
                loy = jnp.minimum(tay, tby)
                hiy = jnp.maximum(tay, tby)
                loz = jnp.minimum(taz, tbz)
                hiz = jnp.maximum(taz, tbz)
                near = jnp.maximum(jnp.maximum(lox, loy), loz)
                far = jnp.minimum(jnp.minimum(hix, hiy), hiz)
                okb = (near < far) & (fld(6) > 0.0)
                near_in = okb & (t_min < near) & (near < t_max)
                far_in = okb & (t_min < far) & (far < t_max)
                t = jnp.where(near_in, near, far)
                ok = (near_in | far_in) & (t < bt)
                # entry/exit face axis (boxes.slab tie rules)
                axis_near = jnp.where(
                    lox >= loy, jnp.where(lox >= loz, 0.0, 2.0),
                    jnp.where(loy >= loz, 1.0, 2.0))
                axis_far = jnp.where(
                    hix <= hiy, jnp.where(hix <= hiz, 0.0, 2.0),
                    jnp.where(hiy <= hiz, 1.0, 2.0))
                axisv = jnp.where(near_in, axis_near, axis_far)
                nearf = near_in.astype(jnp.float32)
            else:
                # half-b quadratic, t1-else-t2 in-range rule (sphere.rs:83-109)
                lx = o_x - fld(0)
                ly = o_y - fld(1)
                lz = o_z - fld(2)
                half_b = d_x * lx + d_y * ly + d_z * lz
                cc = lx * lx + ly * ly + lz * lz - fld(3)
                delta = half_b * half_b - cc
                sq = jnp.sqrt(jnp.maximum(delta, 0.0))
                t1 = -half_b - sq
                t2 = -half_b + sq
                okd = (delta > 0.0) & (fld(4) > 0.0)
                in1 = okd & (t_min < t1) & (t1 < t_max)
                in2 = okd & (t_min < t2) & (t2 < t_max)
                t = jnp.where(in1, t1, t2)
                ok = (in1 | in2) & (t < bt)

            tm = jnp.where(ok, t, BIG)
            rmin = jnp.min(tm, axis=1, keepdims=True)        # (PACKET, 1)
            take = rmin < bt
            if _NOATTR:  # perf probe: traversal cost without attr selection
                # column 1 counts sweeps per packet (admission diagnostics)
                return jnp.where(
                    take,
                    jnp.concatenate([rmin, st[:, 1:2] + 1.0, st[:, 2:]], 1),
                    jnp.concatenate([bt, st[:, 1:2] + 1.0, st[:, 2:]], 1))
            # winner mask without a tie-break pass: a tie needs two distinct
            # primitives at the exact same f32 t (measure-zero for tri /
            # sphere; a tie would sum two attr rows for that ray) — dropping
            # the min-lane-index reduction saved ~0.2 us/sweep. BOXES tie
            # structurally (a grid's shared face is one box's exit plane and
            # its neighbor's entry plane), so the box kind keeps the
            # tie-break.
            if kind == "box":
                lane_i = jax.lax.broadcasted_iota(jnp.int32,
                                                  (PACKET, LANES), 1)
                arg = jnp.min(jnp.where(tm == rmin, lane_i, LANES),
                              axis=1, keepdims=True)
                sel = lane_i == arg
            else:
                sel = tm == rmin

            # winner attr extraction as ONE one-hot matmul on the MXU:
            # sel (PACKET, LANES) x block rows (NF, LANES) contracted over
            # lanes -> (PACKET, NF). Exact in f32 (HIGHEST = 3-way bf16
            # split reconstructs the 24-bit mantissa; 127 of 128 products
            # are exactly 0). Replaces ~12 masked lane reductions that
            # measured ~0.85 us/sweep (2/3 of the sweep cost).
            ext = jax.lax.dot_general(
                sel.astype(jnp.float32),
                m if kind != "tri_mxu" else m[:, 512:640],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)         # (PACKET, NF)

            z1 = jnp.zeros_like(rmin)
            if kind == "tri_mxu":
                bsel = jnp.sum(jnp.where(sel, beta, 0.0), axis=1, keepdims=True)
                gsel = jnp.sum(jnp.where(sel, gamma, 0.0), axis=1, keepdims=True)
                w0 = 1.0 - bsel - gsel
                nvec = (ext[:, 2:5] * w0 + ext[:, 5:8] * bsel
                        + ext[:, 8:11] * gsel)
                new = jnp.concatenate(
                    [rmin, nvec, z1, ext[:, 1:2], z1, z1], axis=1)
            elif kind == "tri":
                # beta/gamma vary per (ray, tri) so they cannot ride the
                # static-attr matmul: two masked lane reductions remain
                bsel = jnp.sum(jnp.where(sel, beta, 0.0), axis=1, keepdims=True)
                gsel = jnp.sum(jnp.where(sel, gamma, 0.0), axis=1, keepdims=True)
                w0 = 1.0 - bsel - gsel
                # barycentric vertex-normal blend (triangle_mesh.rs:115-116)
                nvec = (ext[:, 10:13] * w0 + ext[:, 13:16] * bsel
                        + ext[:, 16:19] * gsel)              # (PACKET, 3)
                new = jnp.concatenate(
                    [rmin, nvec, z1, ext[:, 19:20], z1, z1], axis=1)
            elif kind == "box":
                # face axis / entry flag vary per (ray, box): two masked
                # lane reductions; uv rebuilt from the winner's bounds
                # (ext rows 0-5) + the hit point (boxes.intersect uv rule)
                asel = jnp.sum(jnp.where(sel, axisv, 0.0), axis=1,
                               keepdims=True)
                nsel = jnp.sum(jnp.where(sel, nearf, 0.0), axis=1,
                               keepdims=True)
                ph = (jnp.concatenate([o_x, o_y, o_z], axis=1)
                      + jnp.concatenate([d_x, d_y, d_z], axis=1) * rmin)
                den = ext[:, 3:6] - ext[:, 0:3]
                den = jnp.where(jnp.abs(den) < 1e-12, 1.0, den)
                rel = (ph - ext[:, 0:3]) / den               # (PACKET, 3)
                r0, r1, r2 = rel[:, 0:1], rel[:, 1:2], rel[:, 2:3]
                pick_ax = lambda a: jnp.where(a < 0.5, r0,
                                              jnp.where(a < 1.5, r1, r2))
                u = pick_ax(jnp.mod(asel + 1.0, 3.0))
                v = pick_ax(jnp.mod(asel + 2.0, 3.0))
                new = jnp.concatenate(
                    [rmin, asel, nsel, u, v, ext[:, 7:8], z1, z1], axis=1)
            else:
                new = jnp.concatenate(
                    [rmin, ext[:, 0:3], ext[:, 6:7], ext[:, 5:6], z1, z1],
                    axis=1)
            return jnp.where(take, new, st)

        # The walk alternates two segments: (a) a node walk that pushes
        # admitted leaf blocks into SMEM (predicated store — much cheaper
        # than a per-leaf lax.cond around the vector sweep, which measured
        # ~0.85 us of pure branch/phi overhead per taken sweep), and (b) an
        # unconditional fori sweep of the buffered blocks. best_t tightens
        # between chunks, so subsequent walk segments keep pruning.
        # With two_level, a COARSE advance phase precedes (a): vector-test
        # 8-entry windows of cut-subtree-root bboxes until one admits, then
        # walk only inside that subtree's DFS range.
        if two_level:
            NWC = COARSE_MAX // WIN
            cb_base = oct_ * COARSE_MAX
            cr_base = oct_ * (COARSE_MAX * 4)

            def coarse_bits(base, btc):
                """Packed admission bits of one 8-entry coarse window."""
                near, far = slab_rows(cbbv[pl.ds(cb_base + base, WIN), :])
                admit = (near <= far) & (far >= t_min) & (near <= btc)
                bits_f = jnp.max(jnp.where(admit, row_pw, 0.0),
                                 axis=1, keepdims=True)
                return jnp.sum(bits_f, dtype=jnp.float32).astype(jnp.int32)

        def outer(state):
            c, node, st = state
            # best-so-far into lane layout once per segment (the walk prunes
            # against it); the sweep keeps updating the column-layout best_t
            btc = jnp.minimum(jnp.transpose(st[:, 0:1], (1, 0)), cap)

            if two_level:
                # ---- advance: next admitted coarse entry, if the current
                # one is exhausted (node reached its end) or none is active
                cc0 = jnp.minimum(jnp.maximum(c, 0), COARSE_MAX - 1)
                e_cur = crange[cr_base + cc0 * 4 + 1]
                exhausted = (c < 0) | (node >= e_cur)
                cand = jnp.where(exhausted, c + 1, c)
                w0 = jnp.where(exhausted, cand // WIN, NWC)
                lo0 = cand % WIN

                def wcond(s):
                    w, lo, bits = s
                    return (w < NWC) & ((bits >> lo) == 0)

                def wbody(s):
                    w, lo, bits = s
                    w2 = w + 1
                    return (w2, jnp.asarray(0, jnp.int32),
                            coarse_bits(jnp.minimum(w2, NWC - 1) * WIN, btc))

                w, lo, bits = jax.lax.while_loop(
                    wcond, wbody,
                    (w0, lo0,
                     coarse_bits(jnp.minimum(w0, NWC - 1) * WIN, btc)))
                sh = bits >> lo
                ffs = jnp.asarray(WIN, jnp.int32)
                for j in range(WIN - 1, -1, -1):  # first set bit of sh
                    ffs = jnp.where(((sh >> j) & 1) > 0,
                                    jnp.asarray(j, jnp.int32), ffs)
                nxt = jnp.where(w < NWC, w * WIN + lo + ffs,
                                jnp.asarray(COARSE_MAX, jnp.int32))
                c = jnp.where(exhausted, nxt, c)
                cc = jnp.minimum(c, COARSE_MAX - 1)
                c_start = crange[cr_base + cc * 4]
                c_end = crange[cr_base + cc * 4 + 1]
                in_cut = c < COARSE_MAX
                node = jnp.where(exhausted,
                                 jnp.where(in_cut, c_start, n_nodes), node)
                end_c = jnp.where(in_cut, c_end,
                                  jnp.asarray(n_nodes, jnp.int32))
            else:
                end_c = n_nodes

            def walk_seg(state):
                # one iteration = one ALIGNED window of WIN consecutive DFS
                # nodes: vector-test all WIN at once, pack per-node any()
                # into the bits of ONE scalar (a single vector->scalar
                # transfer instead of WIN jnp.any's), then resolve the
                # skip-link transitions through the window on the scalar
                # core — bit-identical traversal order to the
                # one-node-per-step walk.
                node, nbuf, btc = state
                base = node // WIN * WIN
                near, far = slab_win(bb_base + base)         # (WIN, 128)
                admit = (near <= far) & (far >= t_min) & (near <= btc)
                in_rng = (base + row_i) < end_c
                bits_f = jnp.max(jnp.where(admit & in_rng, row_pw, 0.0),
                                 axis=1, keepdims=True)      # (WIN, 1)
                bits = jnp.sum(bits_f, dtype=jnp.float32).astype(jnp.int32)

                def win_step(st):
                    i, nbuf = st
                    nd = base + i
                    nl = lk_base + nd * 4
                    admit_i = ((bits >> i) & 1) > 0
                    is_leaf = links[nl + 1] > 0
                    take = admit_i & is_leaf
                    # unconditional store + predicated increment: a per-node
                    # branch (pl.when) here measured ~7 us/packet of
                    # pipeline stalls; a not-taken store is overwritten by
                    # the next node
                    buf[nbuf] = links[nl]
                    nbuf = jnp.where(take, nbuf + 1, nbuf)
                    nxt = jnp.where(admit_i & (~is_leaf), nd + 1,
                                    links[nl + 2])
                    return nxt - base, nbuf

                i, nbuf = jax.lax.while_loop(
                    lambda st: (st[0] < WIN) & (base + st[0] < end_c)
                               & (st[1] < CHUNK),
                    win_step, (node - base, nbuf))
                return base + i, nbuf, btc

            node, nbuf, _ = jax.lax.while_loop(
                lambda s: (s[0] < end_c) & (s[1] < CHUNK), walk_seg,
                (node, jnp.asarray(0, jnp.int32), btc))

            if stream:
                def copy(j):
                    return pltpu.make_async_copy(
                        prim.at[pl.ds(buf[j], 1)], vbuf.at[pl.ds(j, 1)],
                        sem.at[j])

                def issue(j, c):
                    copy(j).start()
                    return c

                jax.lax.fori_loop(0, nbuf, issue, 0)

                def sweep_j(j, st):
                    copy(j).wait()
                    m = vbuf[pl.ds(j, 1), :, :].reshape(vbuf.shape[1],
                                                        vbuf.shape[2])
                    return sweep(m, st)
            else:
                def sweep_j(j, st):
                    m = prim[pl.ds(buf[j], 1), :, :].reshape(
                        prim.shape[1], prim.shape[2])
                    return sweep(m, st)

            st = jax.lax.fori_loop(0, nbuf, sweep_j, st)
            return c, node, st

        st0 = jnp.concatenate(
            [jnp.full((PACKET, 1), BIG, jnp.float32),
             jnp.zeros((PACKET, 7), jnp.float32)], axis=1)
        if two_level:
            # c = -1 forces the first advance; an all-miss packet starts at
            # the COARSE_MAX sentinel and never enters the loop
            c0 = jnp.where(jnp.max(cap) >= t_min, -1, COARSE_MAX).astype(
                jnp.int32)
            _, _, st = jax.lax.while_loop(
                lambda s: s[0] < COARSE_MAX, outer,
                (c0, jnp.asarray(0, jnp.int32), st0))
        else:
            _, _, st = jax.lax.while_loop(
                lambda s: s[1] < n_nodes, outer,
                (jnp.asarray(0, jnp.int32), start, st0))

        # dead lanes are swept alongside live ones (the leaf test is
        # packet-wide); report them as misses
        st = jnp.where(t_cap > 0.0, st, st0)
        out[pl.ds(pidx, 1), :, :] = jnp.transpose(st, (1, 0)).reshape(
            1, 8, PACKET)
        return 0

    jax.lax.fori_loop(0, GROUP, packet, 0)


# prim blocks above this stay in HBM and stream into a VMEM ring per walk
# segment (leaves VMEM headroom for rays/outputs; the resident path's own
# cap is vmem_limit_bytes below)
STREAM_BYTES = int(os.environ.get("RAYSNAIL_BVH_STREAM_BYTES",
                                  str(64 * 1024 * 1024)))


@functools.partial(jax.jit, static_argnames=("kind", "interpret", "stream",
                                              "two_level"))
def bvh_traverse(origin_xyz, dir_xyz, t_cap, bb_packed, links_packed,
                 prim_packed, t_min, t_max, kind: str = "tri",
                 interpret: bool = False, stream: bool | None = None,
                 cbb=None, crange=None, two_level: bool | None = None):
    """-> (t, a0, a1, a2, a3, mat_id), each (N,). Caller pads N to TILE_R.

    t_cap: per-ray admission cap (N,) — pass the best hit distance from
    cheaper primitive groups to prune traversal, and <= 0 (e.g. -1) for
    lanes the integrator already killed. bb_packed (K, M, 8) f32,
    links_packed (K, M, 4) i32 (K = 8 octant orders or 1), prim_packed
    (B, NF, 128) f32 — see scene._pack_leaf_blocks.

    stream: None = auto (HBM leaf streaming when prim blocks exceed
    STREAM_BYTES); True/False force it (tests).

    cbb (K, COARSE_MAX, 8) f32 / crange (K, COARSE_MAX, 4) i32: the
    TWO-LEVEL coarse cut (scene._leaf_tree / accel.bvh.coarse_cut). When
    given AND two_level is enabled, the walk sweeps the cut-root bboxes
    vectorially and only chases skip links inside admitted subtrees.
    Default OFF: measured neutral on the 200k-tri tree and a loss on small
    trees (BASELINE.md round-5 findings); RAYSNAIL_BVH_TWO_LEVEL=1 or
    two_level=True re-enables it for probes.
    """
    ox, oy, oz = (jnp.asarray(a, jnp.float32) for a in origin_xyz)
    dx, dy, dz = (jnp.asarray(a, jnp.float32) for a in dir_xyz)
    n = ox.shape[0]
    assert n % TILE_R == 0, n
    cap = jnp.asarray(t_cap, jnp.float32)

    n_orders, m = bb_packed.shape[0], bb_packed.shape[1]
    # node bounds live in VMEM as (K*M8, 8) so the walk can load an aligned
    # (WIN, 8) window per iteration; pad rows (never read in-range) to M8
    m8 = (m + WIN - 1) // WIN * WIN
    bbv = jnp.pad(jnp.asarray(bb_packed, jnp.float32),
                  ((0, 0), (0, m8 - m), (0, 0))).reshape(-1, 8)
    links_flat = links_packed.reshape(-1)
    pad = jnp.zeros_like(ox)
    rays = jnp.stack([ox, oy, oz, dx, dy, dz, cap, pad])  # (8, N)
    rays = jnp.swapaxes(rays.reshape(8, -1, PACKET), 0, 1)  # (R, 8, PACKET)
    bounds = jnp.asarray([[t_min, t_max]], jnp.float32)

    if stream is None:
        stream = prim_packed.size * 4 > STREAM_BYTES
    if two_level is None:
        # auto: OFF — the coarse sweep measured a loss on small trees and
        # neutral on the 200k-tri tree (BASELINE.md round-5 findings);
        # RAYSNAIL_BVH_TWO_LEVEL=1 re-enables it for probes
        two_level = os.environ.get("RAYSNAIL_BVH_TWO_LEVEL", "0") == "1"
    two_level = two_level and cbb is not None and crange is not None

    blk_spec = pl.BlockSpec((GROUP, 8, PACKET), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    def smem(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda i: (0,) * nd,
                            memory_space=pltpu.SMEM)
    if stream:
        # leaf blocks stay in HBM; the kernel DMAs admitted blocks into a
        # CHUNK-deep VMEM ring per walk segment
        prim_spec = pl.BlockSpec(memory_space=pl.ANY)
        nf = prim_packed.shape[1]
        scratch = [pltpu.SMEM((CHUNK,), jnp.int32),
                   pltpu.VMEM((CHUNK, nf, prim_packed.shape[2]), jnp.float32),
                   pltpu.SemaphoreType.DMA((CHUNK,))]
    else:
        prim_spec = pl.BlockSpec(prim_packed.shape, lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        scratch = [pltpu.SMEM((CHUNK,), jnp.int32)]

    bbv_spec = pl.BlockSpec(bbv.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [blk_spec, bbv_spec, smem(links_flat), prim_spec,
                smem(bounds)]
    args = [rays, bbv, links_flat, prim_packed, bounds]
    if two_level:
        cbbv = jnp.asarray(cbb, jnp.float32).reshape(-1, 8)
        crange_flat = jnp.asarray(crange, jnp.int32).reshape(-1)
        in_specs += [pl.BlockSpec(cbbv.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM),
                     smem(crange_flat)]
        args += [cbbv, crange_flat]
    out = pl.pallas_call(
        functools.partial(_kernel, n_nodes=m, n_orders=n_orders, kind=kind,
                          stream=stream, two_level=two_level),
        grid=(n // TILE_R,),
        in_specs=in_specs,
        out_specs=blk_spec,
        out_shape=jax.ShapeDtypeStruct((n // PACKET, 8, PACKET), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # resident leaf blocks are 12 KB (tri) / 4 KB (sphere) per 128
            # prims: ~1M tris fit under this cap; larger meshes stream
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)

    fields = jnp.swapaxes(out, 0, 1).reshape(8, -1)  # (8, N)
    t, a0, a1, a2, a3, a4 = (fields[i] for i in range(6))
    mat = jnp.round(a4).astype(jnp.int32)
    return t, a0, a1, a2, a3, mat
