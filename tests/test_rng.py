"""Statistical quality of the fast counter-hash RNG backend."""

import jax.numpy as jnp
import numpy as np

from raysnail_tpu.prelude import rng

N = 1 << 16


def _streams(seed=0):
    return rng.fast_streams(rng.key(seed), jnp.arange(N))


def test_uniform_moments():
    u = np.stack([np.asarray(x) for x in rng.ray_uniforms(_streams(), 8)])
    assert u.shape == (8, N)
    assert (u >= 0).all() and (u < 1).all()
    np.testing.assert_allclose(u.mean(axis=1), 0.5, atol=5e-3)
    np.testing.assert_allclose(u.var(axis=1), 1.0 / 12.0, atol=5e-3)


def test_slot_and_ray_decorrelation():
    u = np.stack([np.asarray(x) for x in rng.ray_uniforms(_streams(), 6)])
    # slot-vs-slot correlation
    c = np.corrcoef(u)
    off = c[~np.eye(6, dtype=bool)]
    assert np.abs(off).max() < 0.02
    # ray-vs-neighbor-ray correlation within one slot
    a, b = u[0, :-1], u[0, 1:]
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.02


def test_fold_changes_stream():
    s = _streams()
    u0 = np.asarray(rng.ray_uniforms(s, 1)[0])
    u1 = np.asarray(rng.ray_uniforms(rng.fold_all(s, 1), 1)[0])
    u2 = np.asarray(rng.ray_uniforms(rng.fold_all(s, 2), 1)[0])
    assert np.abs(u0 - u1).mean() > 0.2   # independent-ish
    assert np.abs(u1 - u2).mean() > 0.2
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.02


def test_seed_separation():
    u_a = np.asarray(rng.ray_uniforms(_streams(0), 1)[0])
    u_b = np.asarray(rng.ray_uniforms(_streams(1), 1)[0])
    assert np.abs(u_a - u_b).mean() > 0.2


def test_bucket_chi_square():
    """64-bucket chi-square on one slot: statistic within loose bounds."""
    u = np.asarray(rng.ray_uniforms(_streams(3), 1)[0])
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = N / 64
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # df=63: mean 63, std ~11.2; allow +-6 sigma
    assert 10 < chi2 < 140, chi2


def test_render_fast_vs_threefry_statistically_close():
    import jax

    from raysnail_tpu import ir, render as renderlib
    from raysnail_tpu.camera import build_camera
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.scene import SceneBuilder

    b = SceneBuilder()
    b.add(ir.Sphere((0.0, -100.5, -1.0), 100.0, ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))))
    b.add(ir.Sphere((0.0, 0.0, -1.0), 0.5, ir.Lambertian(ir.Constant((0.7, 0.3, 0.3)))))
    scene = b.compile()
    cfg = RenderConfig(width=32, height=24, samples=49, max_depth=4,
                       ray_batch=1 << 15, gamma=False)
    cam = build_camera(look_from=(0, 0, 1), look_at=(0, 0, -1), fov=50,
                       width=cfg.width, height=cfg.height)
    img_fast = renderlib.render(scene, cam, cfg.replace(rng="fast"), seed=0)
    img_tf = renderlib.render(scene, cam, cfg.replace(rng="threefry"), seed=0)
    # independent MC estimates of the same integral: close in the mean
    assert abs(img_fast.mean() - img_tf.mean()) < 0.02
    assert np.abs(img_fast - img_tf).mean() < 0.08
