import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raysnail_tpu.prelude.vec import Vec3, vec


def _rand_vec(rng, n=64):
    a = rng.standard_normal((n, 3)).astype(np.float32)
    return Vec3.from_array(jnp.asarray(a)), a


def test_roundtrip(rng_np):
    v, a = _rand_vec(rng_np)
    np.testing.assert_allclose(np.asarray(v.to_array()), a)


def test_arith(rng_np):
    v, a = _rand_vec(rng_np)
    w, b = _rand_vec(rng_np)
    np.testing.assert_allclose(np.asarray((v + w).to_array()), a + b, rtol=1e-6)
    np.testing.assert_allclose(np.asarray((v - w).to_array()), a - b, rtol=1e-6)
    np.testing.assert_allclose(np.asarray((v * 2.0).to_array()), a * 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray((v * w).to_array()), a * b, rtol=1e-6)
    np.testing.assert_allclose(np.asarray((-v).to_array()), -a, rtol=1e-6)
    np.testing.assert_allclose(np.asarray((1.0 - v).to_array()), 1.0 - a, rtol=1e-6)


def test_dot_cross(rng_np):
    v, a = _rand_vec(rng_np)
    w, b = _rand_vec(rng_np)
    np.testing.assert_allclose(np.asarray(v.dot(w)), np.sum(a * b, -1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v.cross(w).to_array()), np.cross(a, b), rtol=1e-5, atol=1e-6)


def test_unit(rng_np):
    v, a = _rand_vec(rng_np)
    u = v.unit()
    np.testing.assert_allclose(np.asarray(u.length()), 1.0, rtol=1e-5)


def test_reflect():
    d = vec(1.0, -1.0, 0.0)
    n = vec(0.0, 1.0, 0.0)
    r = d.reflect(n)
    np.testing.assert_allclose(np.asarray(r.to_array()), [1.0, 1.0, 0.0], atol=1e-7)


def test_where(rng_np):
    v, a = _rand_vec(rng_np)
    w, b = _rand_vec(rng_np)
    m = jnp.asarray(rng_np.random(64) > 0.5)
    out = Vec3.where(m, v, w)
    exp = np.where(np.asarray(m)[:, None], a, b)
    np.testing.assert_allclose(np.asarray(out.to_array()), exp)


def test_pytree():
    v = Vec3.full((1.0, 2.0, 3.0), (8,))
    leaves = jax.tree_util.tree_leaves(v)
    assert len(leaves) == 3
    doubled = jax.jit(lambda u: u * 2.0)(v)
    np.testing.assert_allclose(np.asarray(doubled.y), 4.0)


def test_grad_through_vec():
    def f(v):
        return jnp.sum(v.dot(v))

    v = Vec3.full((1.0, 2.0, 3.0), (4,))
    g = jax.grad(f)(v)
    np.testing.assert_allclose(np.asarray(g.x), 2.0)
    np.testing.assert_allclose(np.asarray(g.z), 6.0)
