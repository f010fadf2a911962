import jax
import jax.numpy as jnp
import numpy as np

from raysnail_tpu.prelude import rng, sampling
from raysnail_tpu.prelude.vec import Vec3, vec

N = 200_000


def _uv(seed=0, n=N):
    u1, u2 = rng.uniforms(rng.key(seed), 2, (n,))
    return u1, u2


def test_cosine_direction_distribution():
    u1, u2 = _uv()
    d = sampling.cosine_direction(u1, u2)
    # unit length
    np.testing.assert_allclose(np.asarray(d.length()), 1.0, atol=1e-5)
    z = np.asarray(d.z)
    assert (z >= 0).all()
    # E[cos theta] for pdf cos/pi is 2/3
    np.testing.assert_allclose(z.mean(), 2.0 / 3.0, atol=5e-3)


def test_cosine_power_distribution():
    e = 50.0
    u1, u2 = _uv(1)
    d = sampling.cosine_power_direction(e, u1, u2)
    z = np.asarray(d.z)
    # E[cos] for pdf ~ cos^e on hemisphere with cos = U^(1/(e+1)): E = (e+1)/(e+2)
    np.testing.assert_allclose(z.mean(), (e + 1.0) / (e + 2.0), atol=2e-3)
    np.testing.assert_allclose(np.asarray(d.length()), 1.0, atol=1e-5)


def test_unit_sphere_uniform():
    u1, u2 = _uv(2)
    d = sampling.unit_sphere_direction(u1, u2)
    np.testing.assert_allclose(np.asarray(d.length()), 1.0, atol=1e-5)
    # each component mean ~ 0
    for c in (d.x, d.y, d.z):
        assert abs(np.asarray(c).mean()) < 5e-3
    # E[z^2] = 1/3 for uniform sphere
    np.testing.assert_allclose((np.asarray(d.z) ** 2).mean(), 1.0 / 3.0, atol=5e-3)


def test_unit_disk():
    u1, u2 = _uv(3)
    x, y = sampling.unit_disk(u1, u2)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    # E[r^2] = 1/2 for uniform disk
    np.testing.assert_allclose(r2.mean(), 0.5, atol=5e-3)


def test_quarter_disk_positive_quadrant():
    u1, u2 = _uv(4)
    x, y = sampling.quarter_disk(u1, u2)
    assert (np.asarray(x) >= -1e-6).all() and (np.asarray(y) >= -1e-6).all()
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()


def test_onb_orthonormal():
    k = rng.key(5)
    n = Vec3.from_array(jax.random.normal(k, (1000, 3)))
    onb = sampling.onb_from_w(n)
    for a in onb:
        np.testing.assert_allclose(np.asarray(a.length()), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(onb.u.dot(onb.v)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(onb.u.dot(onb.w)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(onb.v.dot(onb.w)), 0.0, atol=1e-5)
    # w aligned with n
    np.testing.assert_allclose(np.asarray(onb.w.dot(n.unit())), 1.0, atol=1e-5)


def test_onb_degenerate_up():
    # n parallel to +y must hit the fallback branch (onb.rs:25-41)
    n = Vec3.full((0.0, 1.0, 0.0), (4,))
    onb = sampling.onb_from_w(n)
    assert np.isfinite(np.asarray(onb.u.to_array())).all()
    np.testing.assert_allclose(np.asarray(onb.u.dot(onb.w)), 0.0, atol=1e-6)


def test_onb_local_preserves_length():
    u1, u2 = _uv(6, 1000)
    d = sampling.cosine_direction(u1, u2)
    n = Vec3.from_array(jax.random.normal(rng.key(7), (1000, 3))).unit()
    world = sampling.onb_from_w(n).local(d)
    np.testing.assert_allclose(np.asarray(world.length()), 1.0, atol=1e-5)
    # cos-weighted: dot with normal positive
    assert (np.asarray(world.dot(n)) > -1e-5).all()


def test_cosine_pdf_value():
    w = vec(0.0, 0.0, 1.0)
    d = vec(0.0, 0.0, 1.0)
    np.testing.assert_allclose(float(sampling.cosine_pdf_value(w, d)), 1.0 / np.pi, rtol=1e-6)
    d2 = vec(0.0, 0.0, -1.0)
    assert float(sampling.cosine_pdf_value(w, d2)) == 0.0
