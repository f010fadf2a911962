"""Analytic direction samplers and orthonormal bases.

The reference relies on unbounded rejection loops (random_in_unit_sphere
vec3.rs:69-76, random_unit_disk vec3.rs:140-147, sphere light sampling
sphere.rs:149-164). XLA requires static control flow, so every sampler here is
a closed-form inverse-CDF transform producing the *same distribution* (the
quantities that matter for Monte Carlo equivalence), fully vectorized over the
ray batch.

All local samplers return directions in a z-up local frame; use `Onb.local`
to rotate into the surface frame (reference src/prelude/onb.rs).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from raysnail_tpu.prelude.vec import Vec3

PI = math.pi
INV_PI = 1.0 / math.pi


class Onb(NamedTuple):
    """Orthonormal basis (u, v, w) with w the 'normal' axis."""

    u: Vec3
    v: Vec3
    w: Vec3

    def local(self, a: Vec3) -> Vec3:
        """Rotate local z-up vector a into this frame (onb.rs:11-23)."""
        return self.u * a.x + self.v * a.y + self.w * a.z


def onb_from_w(n: Vec3) -> Onb:
    """Build an ONB about n, replicating the reference's fixed-up construction
    (onb.rs:25-41): u = normalize(up x w) with up=(0,1,0), falling back to
    normalize((1,0,0) x w) when w is (anti)parallel to up — vectorized with a
    branch-free select instead of the reference's if."""
    w = n.unit()
    up = Vec3.full((0.0, 1.0, 0.0), w.shape, w.dtype)
    ux = Vec3.full((1.0, 0.0, 0.0), w.shape, w.dtype)
    uc = up.cross(w)
    degenerate = uc.length_squared() < 1e-8
    u = Vec3.where(degenerate, ux.cross(w).unit(), uc.unit())
    v = w.cross(u)
    return Onb(u, v, w)


# -- closed-form samplers (local z-up frame) -------------------------------

def cosine_direction(u1, u2) -> Vec3:
    """cos-weighted hemisphere direction, pdf = cos(theta)/pi
    (reference vec3.rs:100-111)."""
    q2 = jnp.sqrt(u2)
    phi = 2.0 * PI * u1
    return Vec3(jnp.cos(phi) * q2, jnp.sin(phi) * q2, jnp.sqrt(1.0 - u2))


def cosine_power_direction(exponent, u1, u2) -> Vec3:
    """cos^e-lobe direction about +z (reference vec3.rs:114-126):
    cos(theta) = u2^(1/(e+1))."""
    z = jnp.power(u2, 1.0 / (exponent + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u1
    return Vec3(jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, z)


def unit_sphere_direction(u1, u2) -> Vec3:
    """Uniform direction on S^2 (reference random_unit, vec3.rs:91-96)."""
    a = 2.0 * PI * u1
    z = 2.0 * u2 - 1.0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return Vec3(r * jnp.cos(a), r * jnp.sin(a), z)


def unit_disk(u1, u2):
    """Uniform point in the unit disk; analytic polar transform replacing the
    rejection loop at vec3.rs:140-147. Returns (x, y)."""
    r = jnp.sqrt(u1)
    theta = 2.0 * PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def quarter_disk(u1, u2):
    """Uniform point in the first-quadrant quarter of the unit disk. The
    reference's sphere light sampler draws (U1,U2) in [0,1)^2 rejected to the
    unit disk (sphere.rs:149-164) — i.e. uniform over the quarter disk."""
    r = jnp.sqrt(u1)
    theta = 0.5 * PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


# -- pdf evaluations -------------------------------------------------------

def cosine_pdf_value(w: Vec3, direction: Vec3):
    """CosinePdf.value (pdf.rs:34-43): max(cos,0)/pi."""
    return jnp.maximum(0.0, direction.dot(w)) * INV_PI


def cosine_power_pdf_value(w: Vec3, direction: Vec3, exponent):
    """CosinePdfExponent.value (pdf.rs:66-75): cos^e/pi for cos>0 else 0.
    (Note: intentionally replicates the reference's unnormalized density.)"""
    c = direction.dot(w)
    return jnp.where(c > 0.0, jnp.power(jnp.maximum(c, 1e-12), exponent) * INV_PI, 0.0)


def sphere_pdf_value():
    """SpherePdf.value (pdf.rs:215-233): uniform 1/(4*pi)."""
    return 1.0 / (4.0 * PI)
