"""Batched axis-aligned (and transformed) rectangle intersection.

The reference's AARect family (src/hittable/geometry/rect.rs) stores an axis
permutation (a0, a1, k); here the group keeps a per-primitive k-axis index and
selects ray components with gathers, so XY/XZ/YZ rects share one dense test.
Transformed rects (the reference wraps them in a TfFacade,
src/hittable/transform/tf_facade.rs:41-54) carry a per-rect world->object
affine and intersect in object space, with correct inverse-transpose normals
(unlike the facade's untransformed-normal quirk at tf_facade.rs:49-53).
Light sampling on XZ rects lives in the light-sampling module.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raysnail_tpu.geometry import hit as hitlib
from raysnail_tpu.geometry.boxes import _apply_rows, _apply_rows_t
from raysnail_tpu.geometry.hit import BIG, Hit
from raysnail_tpu.prelude.vec import Vec3


class RectGroup(NamedTuple):
    k_axis: jax.Array   # (R,) int32: 0=YZ-rect(x=k), 1=XZ-rect(y=k), 2=XY-rect(z=k)
    k: jax.Array        # (R,) plane coordinate
    a0: jax.Array       # (R,) bounds along the a-axis (reference rect.rs:58-80:
    a1: jax.Array       #      yz->(a=y,b=z), xz->(a=x,b=z), xy->(a=x,b=y))
    b0: jax.Array       # (R,) bounds along the b-axis
    b1: jax.Array
    mat_id: jax.Array
    active: jax.Array
    # Optional orientation (None => all axis-aligned): world -> object rows,
    # identity for untransformed members of a mixed group
    inv_rows: tuple | None = None  # (row0: Vec3, row1: Vec3, row2: Vec3), (R,)
    inv_off: Vec3 | None = None    # (R,)


def _ab_axes(k_axis):
    """Reference axis tuples (rect.rs:58-80): k=0 -> (1,2); k=1 -> (0,2);
    k=2 -> (0,1)."""
    a_axis = jnp.where(k_axis == 0, 1, 0)
    b_axis = jnp.where(k_axis == 2, 1, 2)
    return a_axis, b_axis


def _comp(v: Vec3, axis):
    """Select per-lane component by axis index array (broadcasting)."""
    return jnp.where(axis == 0, v.x, jnp.where(axis == 1, v.y, v.z))


def intersect(group: RectGroup, ray, t_min, t_max) -> Hit:
    o = ray.origin.map(lambda a: a[:, None])
    d = ray.direction.map(lambda a: a[:, None])
    oriented = group.inv_rows is not None
    if oriented:
        rows = tuple(r.map(lambda a: a[None, :]) for r in group.inv_rows)
        off = group.inv_off.map(lambda a: a[None, :])
        o = _apply_rows(rows, off, o, translate=True)
        d = _apply_rows(rows, off, d, translate=False)
    k_axis = group.k_axis[None, :]
    a_axis, b_axis = _ab_axes(k_axis)

    dk = _comp(d, k_axis)
    dk = jnp.where(jnp.abs(dk) < 1e-12, jnp.where(dk < 0, -1e-12, 1e-12), dk)
    t = (group.k[None, :] - _comp(o, k_axis)) / dk
    pa = _comp(o, a_axis) + t * _comp(d, a_axis)
    pb = _comp(o, b_axis) + t * _comp(d, b_axis)
    ok = (
        group.active[None, :]
        & (t_min < t) & (t < t_max)
        & (pa >= group.a0[None, :]) & (pa <= group.a1[None, :])
        & (pb >= group.b0[None, :]) & (pb <= group.b1[None, :])
    )
    t = jnp.where(ok, t, BIG)

    idx = jnp.argmin(t, axis=1)
    onehot = hitlib.onehot_of(idx, t.shape[1])
    t_best = jnp.min(t, axis=1)
    valid = t_best < BIG

    ksel = hitlib.select_table(onehot, group.k_axis)
    geom_n = Vec3(
        jnp.where(ksel == 0, 1.0, 0.0),
        jnp.where(ksel == 1, 1.0, 0.0),
        jnp.where(ksel == 2, 1.0, 0.0),
    )
    if oriented:
        rows_sel = tuple(hitlib.select_table_vec(onehot, r)
                         for r in group.inv_rows)
        geom_n = _apply_rows_t(rows_sel, geom_n).unit()
    a0 = hitlib.select_table(onehot, group.a0)
    a1 = hitlib.select_table(onehot, group.a1)
    b0 = hitlib.select_table(onehot, group.b0)
    b1 = hitlib.select_table(onehot, group.b1)
    u = (hitlib.select_row(onehot, pa) - a0) / (a1 - a0)
    v = (hitlib.select_row(onehot, pb) - b0) / (b1 - b0)
    mat_id = hitlib.select_table(onehot, group.mat_id)
    return hitlib.finalize(ray.direction, t_best, geom_n, u, v, mat_id, valid)
