"""Batched general-quadric intersection.

Implements the reference's quadric surface
qa x^2 + qe y^2 + qh z^2 + qb xy + qc xz + qf yz + qd x + qg y + qi z + qj = 0
(single cross/linear terms — NOT the POV-Ray factor-2 convention; this matches
the reference's hit/normal/contains consistently)
with its exact quadratic/degenerate-linear solve and gradient normal
(src/hittable/geometry/quadric.rs:112-182, 67-100). Affine transforms on
quadrics (and on spheres, which lower to quadrics when non-uniformly scaled)
are baked into the 10 coefficients at scene-compile time via the conjugation
Q' = M^-T Q M^-1 — see geometry/transforms.py — so the hot path needs no
per-primitive matrices and normals are exactly right (unlike the reference's
untransformed-normal quirk, tf_facade.rs:49-53).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raysnail_tpu.geometry import hit as hitlib
from raysnail_tpu.geometry.hit import BIG, Hit
from raysnail_tpu.prelude.vec import Vec3


class QuadricGroup(NamedTuple):
    # coefficient columns, each (Q,)
    qa: jax.Array; qb: jax.Array; qc: jax.Array; qd: jax.Array
    qe: jax.Array; qf: jax.Array; qg: jax.Array
    qh: jax.Array; qi: jax.Array
    qj: jax.Array
    mat_id: jax.Array
    active: jax.Array


class Coeffs(NamedTuple):
    """Scalar coefficient bundle for CSG leaves."""
    qa: jax.Array; qb: jax.Array; qc: jax.Array; qd: jax.Array
    qe: jax.Array; qf: jax.Array; qg: jax.Array
    qh: jax.Array; qi: jax.Array
    qj: jax.Array


def _abc(q, o: Vec3, d: Vec3):
    """Quadratic coefficients along the ray (quadric.rs:112-132).
    Note the reference's b is the half-b (factor 0.5 folded in)."""
    a = (
        d.x * (q.qa * d.x + q.qb * d.y + q.qc * d.z)
        + d.y * (q.qe * d.y + q.qf * d.z)
        + d.z * q.qh * d.z
    )
    b = (
        d.x * (q.qa * o.x + 0.5 * (q.qb * o.y + q.qc * o.z + q.qd))
        + d.y * (q.qe * o.y + 0.5 * (q.qb * o.x + q.qf * o.z + q.qg))
        + d.z * (q.qh * o.z + 0.5 * (q.qc * o.x + q.qf * o.y + q.qi))
    )
    c = (
        o.x * (q.qa * o.x + q.qb * o.y + q.qc * o.z + q.qd)
        + o.y * (q.qe * o.y + q.qf * o.z + q.qg)
        + o.z * (q.qh * o.z + q.qi)
        + q.qj
    )
    return a, b, c


def _roots(a, b, c, t_min, t_max, lin_eps):
    """Branch-free union of the quadratic and degenerate-linear cases.
    Returns (t1, t2, valid) with the reference's in-range selection:
    quadratic: t1 if in range else (t2, BIG); linear: (-c/2b, BIG)."""
    is_lin = jnp.abs(a) <= lin_eps
    safe_a = jnp.where(is_lin, 1.0, a)

    disc = b * b - a * c
    has_q = (~is_lin) & (disc > 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q1 = (-b - sq) / safe_a
    q2 = (-b + sq) / safe_a
    # a < 0 flips the ordering of the roots
    lo = jnp.minimum(q1, q2)
    hi = jnp.maximum(q1, q2)

    safe_b = jnp.where(jnp.abs(b) < 1e-30, 1e-30, b)
    t_lin = -0.5 * c / safe_b
    lin_ok = is_lin & (jnp.abs(b) > lin_eps) & (t_min < t_lin) & (t_lin < t_max)

    in1 = has_q & (t_min < lo) & (lo < t_max)
    in2 = has_q & (t_min < hi) & (hi < t_max)
    t1 = jnp.where(in1, lo, jnp.where(in2, hi, jnp.where(lin_ok, t_lin, BIG)))
    t2 = jnp.where(in1, hi, BIG)
    valid = in1 | in2 | lin_ok
    return t1, t2, valid


def normal_at(q, p: Vec3) -> Vec3:
    """Gradient normal (quadric.rs:67-100) with the arbitrary-direction
    fallback when the gradient vanishes."""
    nx = 2.0 * q.qa * p.x + q.qb * p.y + q.qc * p.z + q.qd
    ny = q.qb * p.x + 2.0 * q.qe * p.y + q.qf * p.z + q.qg
    nz = q.qc * p.x + q.qf * p.y + 2.0 * q.qh * p.z + q.qi
    n = Vec3(nx, ny, nz)
    degenerate = n.length_squared() < 1e-24
    fallback = Vec3.full((1.0, 0.0, 0.0), jnp.shape(nx), p.dtype)
    return Vec3.where(degenerate, fallback, n.unit())


def intersect(group: QuadricGroup, ray, t_min, t_max, lin_eps: float = 1e-12) -> Hit:
    o = ray.origin.map(lambda a: a[:, None])
    d = ray.direction.map(lambda a: a[:, None])
    gq = Coeffs(*(getattr(group, f)[None, :] for f in Coeffs._fields))
    a, b, c = _abc(gq, o, d)
    t1, _, valid = _roots(a, b, c, t_min, t_max, lin_eps)
    t = jnp.where(valid & group.active[None, :], t1, BIG)

    idx = jnp.argmin(t, axis=1)
    onehot = hitlib.onehot_of(idx, t.shape[1])
    t_best = jnp.min(t, axis=1)
    ok = t_best < BIG

    sel = Coeffs(*(hitlib.select_table(onehot, getattr(group, f)) for f in Coeffs._fields))
    p = ray.origin + ray.direction * t_best
    geom_n = normal_at(sel, p)
    u = jnp.zeros_like(t_best)  # quadric uv is (0,0) (quadric.rs:106-110)
    v = jnp.zeros_like(t_best)
    mat_id = hitlib.select_table(onehot, group.mat_id)
    return hitlib.finalize(ray.direction, t_best, geom_n, u, v, mat_id, ok)


# -- CSG support -----------------------------------------------------------

def interval(q: Coeffs, ray, t_min, t_max, lin_eps: float = 1e-12):
    """(t1, t2, valid) of a single quadric per ray (quadric.rs:112-182;
    t2 = BIG when only the far root was in range or the case was linear)."""
    a, b, c = _abc(q, ray.origin, ray.direction)
    return _roots(a, b, c, t_min, t_max, lin_eps)


def contains(q: Coeffs, p: Vec3):
    """Implicit-function sign test (quadric.rs:184-189, <= 0 is inside);
    evaluates the same single-cross-term polynomial as hit()."""
    val = (
        p.x * (q.qa * p.x + q.qb * p.y + q.qd)
        + p.y * (q.qe * p.y + q.qf * p.z + q.qg)
        + p.z * (q.qh * p.z + q.qc * p.x + q.qi)
        + q.qj
    )
    return val <= 0.0
