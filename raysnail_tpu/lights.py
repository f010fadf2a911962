"""Light-source direction sampling (the reference's `HittableList::random`
light list, src/hittable/collection/list.rs:49-52 + per-shape `random`).

The reference picks a uniform random light, then asks it for a direction:
  * Sphere (sphere.rs:149-164): ONB toward the center, a point in the UNIT
    quarter disk (u,v >= 0 — the rejection loop draws U[0,1)^2) offset from
    the center, direction = (offset + center) - origin. Radius is ignored.
  * XZ Rect (rect.rs:141-153): uniform point on the rect. NOTE: the
    reference returns `origin - root` — a direction pointing from the light
    TOWARD the shading point, so its rect lights never contribute through
    the light branch. That code path is dead in the reference (no shipped
    binary renders the Cornell scenes); we use the evidently-intended
    `root - origin`.

The caller normalizes (camera.rs:199-201 calls .unit()).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raysnail_tpu.prelude import sampling
from raysnail_tpu.prelude.vec import Vec3

SPHERE = 0
RECT_XZ = 1


class LightArrays(NamedTuple):
    kind: jax.Array    # (L,) int32
    center: Vec3       # (L,) sphere center (unused for rects)
    radius: jax.Array  # (L,) kept for documentation; sampler ignores it
    k: jax.Array       # (L,) rect plane y
    a0: jax.Array      # (L,) rect x bounds
    a1: jax.Array
    b0: jax.Array      # (L,) rect z bounds
    b1: jax.Array


def sample(lights: LightArrays, origin: Vec3, u_pick, u1, u2, kinds: frozenset) -> Vec3:
    """Unnormalized direction toward a uniformly-chosen light."""
    n_lights = lights.kind.shape[0]
    idx = jnp.minimum((u_pick * n_lights).astype(jnp.int32), n_lights - 1)
    kind = lights.kind[idx]
    center = Vec3(lights.center.x[idx], lights.center.y[idx], lights.center.z[idx])

    direction = center - origin  # base case; exact for a point at the center
    if SPHERE in kinds:
        onb = sampling.onb_from_w(direction)
        du, dv = sampling.quarter_disk(u1, u2)
        offset = onb.u * du + onb.v * dv
        sph_dir = (offset + center) - origin
        direction = Vec3.where(kind == SPHERE, sph_dir, direction)

    if RECT_XZ in kinds:
        rx = lights.a0[idx] + u1 * (lights.a1[idx] - lights.a0[idx])
        rz = lights.b0[idx] + u2 * (lights.b1[idx] - lights.b0[idx])
        root = Vec3(rx, lights.k[idx], rz)
        rect_dir = root - origin  # corrected direction (see module docstring)
        direction = Vec3.where(kind == RECT_XZ, rect_dir, direction)

    return direction


# -- proper one-sample MIS support (cfg.proper_mis) -------------------------
# The reference has no correct light pdf at all (HittablePdf.value falls back
# to a cosine, pdf.rs:254-263). These are the physically-correct samplers and
# solid-angle densities used by the proper-MIS estimator.

def sample_proper(lights: LightArrays, origin: Vec3, u_pick, u1, u2,
                  kinds: frozenset) -> Vec3:
    """Solid-angle-uniform cone sampling for sphere lights; area sampling for
    rects (same as compat). Returns an unnormalized direction."""
    n_lights = lights.kind.shape[0]
    idx = jnp.minimum((u_pick * n_lights).astype(jnp.int32), n_lights - 1)
    kind = lights.kind[idx]
    center = Vec3(lights.center.x[idx], lights.center.y[idx], lights.center.z[idx])
    direction = center - origin

    if SPHERE in kinds:
        to_c = center - origin
        dist2 = to_c.length_squared()
        r = lights.radius[idx]
        cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - r * r / jnp.maximum(dist2, 1e-12)))
        cos_t = 1.0 - u1 * (1.0 - cos_max)
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        phi = 2.0 * jnp.pi * u2
        onb = sampling.onb_from_w(to_c)
        cone = onb.local(Vec3(jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t))
        direction = Vec3.where(kind == SPHERE, cone, direction)

    if RECT_XZ in kinds:
        rx = lights.a0[idx] + u1 * (lights.a1[idx] - lights.a0[idx])
        rz = lights.b0[idx] + u2 * (lights.b1[idx] - lights.b0[idx])
        root = Vec3(rx, lights.k[idx], rz)
        direction = Vec3.where(kind == RECT_XZ, root - origin, direction)

    return direction


def pdf_value(lights: LightArrays, origin: Vec3, direction: Vec3,
              kinds: frozenset):
    """Solid-angle pdf of sample_proper's uniform-over-lights mixture,
    evaluated at a (unit) direction."""
    n_lights = lights.kind.shape[0]
    total = jnp.zeros(jnp.shape(direction.x), direction.x.dtype)
    for i in range(n_lights):
        # kinds are traced; compute both densities and select (L is small)
        p_i = jnp.zeros_like(total)
        if SPHERE in kinds:
            center = Vec3(lights.center.x[i], lights.center.y[i], lights.center.z[i])
            to_c = center - origin
            dist2 = to_c.length_squared()
            r = lights.radius[i]
            cos_max = jnp.sqrt(jnp.maximum(0.0, 1.0 - r * r / jnp.maximum(dist2, 1e-12)))
            solid = 2.0 * jnp.pi * (1.0 - cos_max)
            cos_d = direction.dot(to_c.unit())
            inside = cos_d >= cos_max
            p_sph = jnp.where(inside, 1.0 / jnp.maximum(solid, 1e-8), 0.0)
            p_i = jnp.where(lights.kind[i] == SPHERE, p_sph, p_i)
        if RECT_XZ in kinds:
            dy = direction.y
            dy_safe = jnp.where(jnp.abs(dy) < 1e-8, 1e-8, dy)
            t = (lights.k[i] - origin.y) / dy_safe
            hx = origin.x + t * direction.x
            hz = origin.z + t * direction.z
            on_rect = (
                (t > 1e-3)
                & (hx >= lights.a0[i]) & (hx <= lights.a1[i])
                & (hz >= lights.b0[i]) & (hz <= lights.b1[i])
            )
            area = (lights.a1[i] - lights.a0[i]) * (lights.b1[i] - lights.b0[i])
            cos_l = jnp.abs(dy)
            p_rect = jnp.where(on_rect, t * t / jnp.maximum(cos_l * area, 1e-8), 0.0)
            p_i = jnp.where(lights.kind[i] == RECT_XZ, p_rect, p_i)
        total = total + p_i
    return total / n_lights
