"""Texture table evaluation: checker sign, image lookup, perlin modes."""

import jax.numpy as jnp
import numpy as np

from raysnail_tpu import ir, textures as texlib
from raysnail_tpu.prelude.vec import Vec3
from raysnail_tpu.scene import SceneBuilder


def table_for(*specs):
    b = SceneBuilder()
    for i, s in enumerate(specs):
        b.add(ir.Sphere((i * 3.0, 0, 0), 1.0, ir.Lambertian(s)))
    scene = b.compile()
    return scene.arrays.textures, scene.static.tex_modes, scene


def test_checker_sign():
    t, modes, scene = table_for(ir.Checker(ir.Constant((1, 0, 0)), ir.Constant((0, 1, 0)), 2.0))
    tex_id = scene.arrays.materials.tex_id[scene.arrays.spheres.mat_id[0]]
    n = 8
    tid = jnp.full(n, tex_id, jnp.int32)
    # sin(2*x)sin(2*y)sin(2*z) > 0 at (0.5,0.5,0.5) -> even color (green)
    p = Vec3.full((0.5, 0.5, 0.5), (n,))
    c = texlib.evaluate(t, tid, jnp.zeros(n), jnp.zeros(n), p, modes)
    np.testing.assert_allclose(np.asarray(c.to_array())[0], [0, 1, 0], atol=1e-6)
    # negative sign -> odd color (red)
    p2 = Vec3.full((0.5, 0.5, -0.5), (n,))
    c2 = texlib.evaluate(t, tid, jnp.zeros(n), jnp.zeros(n), p2, modes)
    np.testing.assert_allclose(np.asarray(c2.to_array())[0], [1, 0, 0], atol=1e-6)


def test_perlin_modes_differ_and_are_bounded():
    specs = [ir.Noise(kind="normal", scale=1.0, vector=True, smooth=s)
             for s in ("hermitian", "linear", "none")]
    t, modes, scene = table_for(*specs)
    n = 512
    rng = np.random.default_rng(0)
    p = Vec3.from_array(jnp.asarray(rng.uniform(-8, 8, (n, 3)), jnp.float32))
    outs = []
    for i in range(3):
        tex_id = scene.arrays.materials.tex_id[scene.arrays.spheres.mat_id[i]]
        tid = jnp.full(n, tex_id, jnp.int32)
        c = texlib.evaluate(t, tid, jnp.zeros(n), jnp.zeros(n), p, modes)
        v = np.asarray(c.x)
        assert np.isfinite(v).all()
        outs.append(v)
    assert np.abs(outs[0] - outs[1]).max() > 1e-4  # hermitian vs linear differ
    assert np.abs(outs[0] - outs[2]).max() > 1e-4  # vs none


def test_marble_bounded():
    t, modes, scene = table_for(ir.Noise(kind="marble", scale=4.0, vector=True))
    tex_id = scene.arrays.materials.tex_id[scene.arrays.spheres.mat_id[0]]
    n = 256
    rng = np.random.default_rng(1)
    p = Vec3.from_array(jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32))
    tid = jnp.full(n, tex_id, jnp.int32)
    c = texlib.evaluate(t, tid, jnp.zeros(n), jnp.zeros(n), p, modes)
    v = np.asarray(c.x)
    assert (v >= 0).all() and (v <= 1.0).all()
    assert v.std() > 0.05  # actually varies


def test_checker_texture_children():
    """Checker is generic over child textures (checker.rs:8-28): a checker of
    (marble, constant-blue) must return the marble value on odd cells and
    blue on even cells, matching standalone evaluations of the children."""
    marble = ir.Noise(kind="marble", scale=4.0, vector=True)
    blue = ir.Constant((0.1, 0.2, 0.9))
    t, modes, scene = table_for(ir.Checker(marble, blue, 2.0), marble)
    assert texlib.CHECKER_DEEP in modes
    tex_id = scene.arrays.materials.tex_id[scene.arrays.spheres.mat_id[0]]
    marble_id = scene.arrays.materials.tex_id[scene.arrays.spheres.mat_id[1]]

    n = 512
    rng = np.random.default_rng(3)
    p = Vec3.from_array(jnp.asarray(rng.uniform(-4, 4, (n, 3)), jnp.float32))
    tid = jnp.full(n, tex_id, jnp.int32)
    u = jnp.zeros(n)
    got = np.asarray(texlib.evaluate(t, tid, u, u, p, modes).to_array())

    mref = np.asarray(texlib.evaluate(
        t, jnp.full(n, marble_id, jnp.int32), u, u, p, modes).to_array())
    odd = np.asarray(jnp.sin(2.0 * p.x) * jnp.sin(2.0 * p.y) * jnp.sin(2.0 * p.z)) < 0
    want = np.where(odd[:, None], mref, np.asarray([0.1, 0.2, 0.9], np.float32))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_checker_constant_children_unchanged():
    """Constant-children checkers still work when another checker is deep."""
    t, modes, scene = table_for(
        ir.Checker(ir.Constant((1, 0, 0)), ir.Constant((0, 1, 0)), 2.0),
        ir.Checker(ir.Noise(kind="normal", scale=1.0, vector=True),
                   ir.Constant((0, 0, 1)), 2.0),
    )
    assert texlib.CHECKER_DEEP in modes
    tex_id = scene.arrays.materials.tex_id[scene.arrays.spheres.mat_id[0]]
    n = 8
    tid = jnp.full(n, tex_id, jnp.int32)
    p = Vec3.full((0.5, 0.5, 0.5), (n,))
    c = texlib.evaluate(t, tid, jnp.zeros(n), jnp.zeros(n), p, modes)
    np.testing.assert_allclose(np.asarray(c.to_array())[0], [0, 1, 0], atol=1e-6)


def test_perlin_hash_deterministic_and_seeded():
    """Hash lattice (textures._lattice_corner): same seed reproduces the
    field exactly; different seeds decorrelate it; float values live in
    [0,1) and gradients on the unit sphere."""
    n = 512
    rng = np.random.default_rng(3)
    p = Vec3.from_array(jnp.asarray(rng.uniform(-8, 8, (n, 3)), jnp.float32))

    def field(seed):
        t, modes, scene = table_for(
            ir.Noise(kind="normal", scale=1.0, vector=True, seed=seed))
        tex_id = scene.arrays.materials.tex_id[scene.arrays.spheres.mat_id[0]]
        tid = jnp.full(n, tex_id, jnp.int32)
        return np.asarray(
            texlib.evaluate(t, tid, jnp.zeros(n), jnp.zeros(n), p, modes).x)

    a1, a2, b = field(0), field(0), field(1)
    np.testing.assert_array_equal(a1, a2)          # reproducible
    assert np.abs(a1 - b).max() > 1e-3             # seeds decorrelate

    # raw corner distributions
    xi = jnp.asarray(rng.integers(-1000, 1000, n), jnp.int32)
    yi = jnp.asarray(rng.integers(-1000, 1000, n), jnp.int32)
    zi = jnp.asarray(rng.integers(-1000, 1000, n), jnp.int32)
    f, gx, gy, gz = texlib._lattice_corner(jnp.uint32(7), xi, yi, zi)
    f, gx, gy, gz = map(np.asarray, (f, gx, gy, gz))
    assert (f >= 0).all() and (f < 1).all()
    np.testing.assert_allclose(gx * gx + gy * gy + gz * gz, 1.0, atol=1e-5)
