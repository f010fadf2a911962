"""Constant-density participating media (reference: src/hittable/medium/constant.rs).

A medium wraps a convex boundary leaf (sphere or box). Per ray: find the
boundary interval over the FULL range (entry may be behind the origin —
constant.rs:46-47), clamp to [t_min, t_max], then sample an exponential free
path -ln(U)/density (constant.rs:60-68). A scatter inside the interval yields
a hit with the medium's Isotropic material, dummy normal (1,0,0) and
outside=false (constant.rs:69-79).

The RNG draw makes medium intersection stochastic: the scene intersector
passes a per-(ray, medium) uniform.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raysnail_tpu.geometry import boxes
from raysnail_tpu.geometry.hit import BIG, Hit
from raysnail_tpu.prelude.vec import Vec3


class MediumNode(NamedTuple):
    boundary: object       # SphereLeaf or BoxLeaf (csg leaf protocol)
    neg_inv_density: jax.Array
    mat_id: int            # Isotropic material row

    def hit(self, ray, t_min, t_max, u) -> Hit:
        t1, t2, valid = _raw_interval(self.boundary, ray)
        t1 = jnp.maximum(t1, t_min)
        t2 = jnp.minimum(t2, t_max)
        valid = valid & (t1 < t2)
        t1 = jnp.maximum(t1, 0.0)

        distance_inside = t2 - t1  # unit directions
        hit_distance = self.neg_inv_density * jnp.log(jnp.maximum(u, 1e-12))
        scatters = valid & (hit_distance <= distance_inside) & (t1 + hit_distance > t_min)
        t = jnp.where(scatters, t1 + hit_distance, BIG)

        shape = jnp.shape(t)
        return Hit(
            t=t,
            valid=scatters,
            normal=Vec3.full((1.0, 0.0, 0.0), shape, t.dtype),
            u=jnp.zeros(shape, t.dtype),
            v=jnp.zeros(shape, t.dtype),
            mat_id=jnp.full(shape, self.mat_id, jnp.int32),
            outside=jnp.zeros(shape, bool),
        )


def _raw_interval(leaf, ray):
    """Boundary (t_entry, t_exit, valid) over the full real line."""
    from raysnail_tpu.geometry.csg import BoxLeaf, SphereLeaf

    if isinstance(leaf, SphereLeaf):
        l = ray.origin - leaf.center
        half_b = ray.direction.dot(l)
        c = l.length_squared() - leaf.radius * leaf.radius
        delta = half_b * half_b - c
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        return -half_b - sq, -half_b + sq, delta > 0.0
    if isinstance(leaf, BoxLeaf):
        o, d = ray.origin, ray.direction
        if leaf.inv_rows is not None:
            o = boxes._apply_rows(leaf.inv_rows, leaf.inv_off, o, translate=True)
            d = boxes._apply_rows(leaf.inv_rows, leaf.inv_off, d, translate=False)
        t_near, t_far, _, _ = boxes.slab(leaf.p_min, leaf.p_max, o, d)
        return t_near, t_far, t_near < t_far
    raise TypeError(f"unsupported medium boundary: {type(leaf)}")


def intersect_media(media, ray, t_min, t_max, uniforms) -> Hit:
    from raysnail_tpu.geometry.hit import combine_hits, miss

    best = miss(jnp.shape(ray.direction.x), ray.direction.dtype)
    for node, u in zip(media, uniforms):
        best = combine_hits(best, node.hit(ray, t_min, t_max, u))
    return best
