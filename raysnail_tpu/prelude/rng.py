"""Counter-based RNG for the path tracer.

The reference uses per-thread XorShift RNGs seeded from the OS
(src/prelude/random.rs:116-127), so its renders are not reproducible. Here we
use JAX's counter-based threefry keys derived deterministically from
(pass, tile, bounce, purpose), which makes renders reproducible and
shard-invariant enough for testing, and keeps every draw a pure function —
required for jit/grad and for sharding the ray batch across a device mesh.

Convention: one base key per render pass; every RAY owns a key derived by
folding in its (pixel_id, sample_id), and per-bounce/purpose sub-keys fold in
further tags. Because draws are keyed by ray identity rather than position in
the batch, renders are INVARIANT to batch tiling and mesh sharding — the same
(seed, pixel, sample) always sees the same stream on 1 chip or N.
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


# -- per-ray counter-based keys --------------------------------------------

def per_ray_keys(k: jax.Array, ids) -> jax.Array:
    """One key per ray: fold the ray's integer identity into the base key.
    ids is any int array (N,); result is a batch of keys (N, ...)."""
    return jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.asarray(ids, jnp.uint32))


def fold_all(keys: jax.Array, tag) -> jax.Array:
    """Fold a (scalar or traced) tag into a batch of per-ray keys."""
    return jax.vmap(lambda k: jax.random.fold_in(k, tag))(keys)


def ray_uniforms(keys: jax.Array, n: int, dtype=jnp.float32):
    """n U[0,1) draws per ray from per-ray keys -> tuple of n (N,) arrays."""
    u = jax.vmap(lambda k: jax.random.uniform(k, (n,), dtype))(keys)
    return tuple(u[:, i] for i in range(n))
