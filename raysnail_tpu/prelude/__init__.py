"""L0 math core: vectors, RNG, sampling, color (reference: src/prelude/)."""

from raysnail_tpu.prelude.vec import Vec3
from raysnail_tpu.prelude import rng, sampling, color

__all__ = ["Vec3", "rng", "sampling", "color"]
