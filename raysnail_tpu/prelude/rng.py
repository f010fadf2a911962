"""Counter-based RNG for the path tracer.

The reference uses per-thread XorShift RNGs seeded from the OS
(src/prelude/random.rs:116-127), so its renders are not reproducible. Here we
use JAX's counter-based threefry keys derived deterministically from
(pass, tile, bounce, purpose), which makes renders reproducible and
shard-invariant enough for testing, and keeps every draw a pure function —
required for jit/grad and for sharding the ray batch across a device mesh.

Convention: one base key per render pass; derive sub-keys by folding in small
integer tags. Per-ray decorrelation comes from drawing array-shaped uniforms
(shape = ray batch), not from per-ray keys — one threefry sweep per draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# purpose tags (folded into keys so draws for different uses are independent)
RAYGEN = 1
LENS = 2
TIME = 3
SCATTER = 4
LIGHT = 5
MEDIUM = 6
MIX = 7
BRANCH = 8


def key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def fold(k: jax.Array, *tags: int) -> jax.Array:
    for t in tags:
        k = jax.random.fold_in(k, t)
    return k


def uniform(k: jax.Array, shape=(), dtype=jnp.float32) -> jax.Array:
    """U[0,1) of the given shape."""
    return jax.random.uniform(k, shape, dtype)


def uniforms(k: jax.Array, n: int, shape=(), dtype=jnp.float32):
    """n independent U[0,1) arrays of the given shape (single threefry sweep)."""
    u = jax.random.uniform(k, (n,) + tuple(shape), dtype)
    return tuple(u[i] for i in range(n))
