import jax
import jax.numpy as jnp
import numpy as np

from raysnail_tpu.prelude import rng, sampling
from raysnail_tpu.prelude.sampling import PI
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


def _rows(mtype, p0, p1, n):
    from raysnail_tpu import materials as m
    z = jnp.zeros(n, jnp.float32)
    return m.Rows(
        mtype=jnp.full(n, mtype, jnp.int32), tex_id=jnp.zeros(n, jnp.int32),
        param0=jnp.full(n, p0, jnp.float32), param1=jnp.full(n, p1, jnp.float32),
        emit_mult=z, phong_factor=z, phong_exponent=z,
    )


def test_proper_bsdf_pdf_integrates_to_one():
    """proper=True densities must integrate to 1 over the sphere (the MIS
    mixture denominator is only unbiased for a true density)."""
    from raysnail_tpu import materials as m

    n = N
    u1, u2 = _uv(5, n)
    d = sampling.unit_sphere_direction(u1, u2)     # uniform sphere samples
    normal = Vec3.full((0.0, 0.0, 1.0), (n,), jnp.float32)
    ray_dir = Vec3.full((0.6, 0.0, -0.8), (n,), jnp.float32)  # unit, into surface

    for mtype, p0, p1, kinds in [
        (m.LAMBERTIAN, 0.0, 0.0, frozenset({m.LAMBERTIAN})),
        (m.DIFFUSE_METAL, 40.0, 0.0, frozenset({m.DIFFUSE_METAL})),
        (m.BLINN_PHONG, 0.4, 25.0, frozenset({m.BLINN_PHONG})),
        (m.ISOTROPIC, 0.0, 0.0, frozenset({m.ISOTROPIC})),
    ]:
        rows = _rows(mtype, p0, p1, n)
        val = m.bsdf_pdf_value(rows, ray_dir, normal, d, kinds, proper=True)
        integral = float(jnp.mean(val) * 4.0 * PI)
        np.testing.assert_allclose(integral, 1.0, atol=0.03), (mtype, integral)


def test_proper_bsdf_pdf_matches_sampler():
    """E[1/p(x)] over x ~ p equals the measure of the support (sampler
    consistency for the proper DiffuseMetal lobe density)."""
    from raysnail_tpu import materials as m
    from raysnail_tpu.prelude import rng as prng

    n = N
    e = 40.0
    us = prng.uniforms(prng.key(9), 2 + 2 * m.REJECT_TRIES + 1, (n,))
    normal = Vec3.full((0.0, 0.0, 1.0), (n,), jnp.float32)
    ray_dir = Vec3.full((0.0, 0.0, -1.0), (n,), jnp.float32)  # normal incidence
    rows = _rows(m.DIFFUSE_METAL, e, 0.0, n)
    d = m.bsdf_sample(rows, ray_dir, normal, us, frozenset({m.DIFFUSE_METAL}))
    val = m.bsdf_pdf_value(rows, ray_dir, normal, d, frozenset({m.DIFFUSE_METAL}),
                           proper=True)
    # importance-sampling identity: for a second density q on the same
    # support (a sharper lobe, so q/p is bounded), E_p[q/p] = 1. At normal
    # incidence the lobe sits entirely above the horizon, so no rejection
    # distortion.
    e2 = 2.0 * e
    cos_r = jnp.maximum(0.0, d.dot(Vec3.full((0.0, 0.0, 1.0), (n,), jnp.float32)))
    q = (e2 + 1.0) / (2.0 * PI) * jnp.power(jnp.maximum(cos_r, 1e-12), e2)
    est = float(jnp.mean(q / jnp.maximum(val, 1e-12)))
    np.testing.assert_allclose(est, 1.0, rtol=0.02)
