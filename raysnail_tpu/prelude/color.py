"""Framebuffer color handling (reference: src/prelude/color.rs, vec3.rs:225-240).

Accumulation happens in f32 Vec3 radiance sums; `into_color` divides by the
sample count and applies the sqrt gamma curve, `to_u8` quantizes for PNG.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raysnail_tpu.prelude.vec import Vec3


def into_color(accum: Vec3, samples, gamma: bool = True) -> Vec3:
    """Average radiance -> display color (vec3.rs:225-240): divide by spp,
    optional sqrt gamma; non-finite samples are dropped to 0."""
    scale = 1.0 / samples
    c = accum * scale
    c = Vec3.where(c.isfinite(), c, Vec3.zeros(c.shape, c.dtype))
    c = c.map(lambda v: jnp.clip(v, 0.0, None))
    if gamma:
        c = c.map(jnp.sqrt)
    return c


def to_u8(img) -> np.ndarray:
    """[H,W,3] float -> uint8 with the reference's clamp-to-0.999 quantization
    (prelude/mod.rs:22-39 clamp + painter u8 conversion)."""
    a = np.asarray(img)
    a = np.nan_to_num(a, nan=0.0, posinf=1.0, neginf=0.0)
    return (np.clip(a, 0.0, 0.999) * 256.0).astype(np.uint8)
