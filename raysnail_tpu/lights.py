"""Light-source direction sampling (the reference's `HittableList::random`
light list, src/hittable/collection/list.rs:49-52 + per-shape `random`).

The reference picks a uniform random light, then asks it for a direction:
  * Sphere (sphere.rs:149-164): ONB toward the center, a point in the UNIT
    quarter disk (u,v >= 0 — the rejection loop draws U[0,1)^2) offset from
    the center, direction = (offset + center) - origin. Radius is ignored.
  * XZ Rect (rect.rs:141-153): uniform point on the rect, direction =
    origin - root (note the reference's inverted direction; replicated).

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
        rect_dir = origin - root  # reference's (inverted) convention
        direction = Vec3.where(kind == RECT_XZ, rect_dir, direction)

    return direction
