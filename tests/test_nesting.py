"""Nested Checker textures and nested Mixed materials.

The reference's Checker<T1, T2> (checker.rs:8-28) and MixedMaterial
(mixed_material.rs:15-23) are generic over their children, including
checker-of-checker and mixed-of-mixed; these tests pin the table-driven
equivalents (static-depth descent in textures.evaluate / materials.resolve).
"""

import jax.numpy as jnp
import numpy as np

from raysnail_tpu import ir, materials as matlib, textures as texlib
from raysnail_tpu.camera import build_camera
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.prelude.vec import Vec3
from raysnail_tpu.render import render
from raysnail_tpu.scene import SceneBuilder

RED, GREEN, BLUE = (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)


def _checker_ref(p, scale, odd, even):
    s = np.sin(scale * p[0]) * np.sin(scale * p[1]) * np.sin(scale * p[2])
    return odd if s < 0 else even


def test_checker_of_checker_matches_recursive_eval():
    inner = ir.Checker(ir.Constant(RED), ir.Constant(GREEN), 4.0)
    outer = ir.Checker(inner, ir.Constant(BLUE), 2.0)
    b = SceneBuilder()
    b.add(ir.Sphere((0, 0, 0), 1.0, ir.Lambertian(outer)))
    scene = b.compile()
    t, modes = scene.arrays.textures, scene.static.tex_modes
    assert ("checker_depth", 2) in modes

    tex_id = int(scene.arrays.materials.tex_id[scene.arrays.spheres.mat_id[0]])
    rng = np.random.default_rng(11)
    pts = rng.uniform(-3, 3, (64, 3)).astype(np.float32)
    tid = jnp.full(64, tex_id, jnp.int32)
    p = Vec3.from_array(jnp.asarray(pts))
    got = np.asarray(
        texlib.evaluate(t, tid, jnp.zeros(64), jnp.zeros(64), p, modes)
        .to_array())

    want = np.stack([
        _checker_ref(q, 2.0,
                     _checker_ref(q, 4.0, np.array(RED), np.array(GREEN)),
                     np.array(BLUE))
        for q in pts])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_triple_nested_checker_compiles_and_differs():
    lvl1 = ir.Checker(ir.Constant(RED), ir.Constant(GREEN), 8.0)
    lvl2 = ir.Checker(lvl1, ir.Constant(BLUE), 4.0)
    lvl3 = ir.Checker(ir.Constant((1, 1, 0)), lvl2, 2.0)
    b = SceneBuilder()
    b.add(ir.Sphere((0, 0, 0), 1.0, ir.Lambertian(lvl3)))
    scene = b.compile()
    assert ("checker_depth", 3) in scene.static.tex_modes
    t, modes = scene.arrays.textures, scene.static.tex_modes
    tex_id = int(scene.arrays.materials.tex_id[scene.arrays.spheres.mat_id[0]])
    rng = np.random.default_rng(3)
    pts = rng.uniform(-3, 3, (256, 3)).astype(np.float32)
    tid = jnp.full(256, tex_id, jnp.int32)
    got = np.asarray(
        texlib.evaluate(t, tid, jnp.zeros(256), jnp.zeros(256),
                        Vec3.from_array(jnp.asarray(pts)), modes).to_array())
    # all four leaf colors reachable
    for color in (RED, GREEN, BLUE, (1, 1, 0)):
        assert (np.abs(got - np.asarray(color)).sum(-1) < 1e-5).any(), color


def _mixed_scene():
    nested = ir.Mixed(
        ir.Mixed(ir.Lambertian(ir.Constant(RED)), ir.Metal(ir.Constant(GREEN)),
                 0.5),
        ir.Dielectric(ior=1.5), 0.5)
    b = SceneBuilder()
    b.add(ir.Sphere((0, 0, 0), 1.0, nested))
    return b.compile()


def test_nested_mixed_resolve_levels():
    scene = _mixed_scene()
    assert scene.static.mix_depth == 2
    table = scene.arrays.materials
    root = scene.arrays.spheres.mat_id[0:1]

    def leaf_mtype(u1, u2):
        u = jnp.asarray([[u1], [u2]], jnp.float32)
        m = matlib.resolve(table, root, u, depth=2)
        return int(table.mtype[m][0])

    # level 1 picks mix_a (inner Mixed) for u1 < 0.5 else the Dielectric;
    # level 2 then picks Lambertian / Metal inside the inner Mixed
    assert leaf_mtype(0.1, 0.1) == matlib.LAMBERTIAN
    assert leaf_mtype(0.1, 0.9) == matlib.METAL
    assert leaf_mtype(0.9, 0.1) == matlib.DIELECTRIC
    assert leaf_mtype(0.9, 0.9) == matlib.DIELECTRIC


def test_nested_mixed_frequencies():
    scene = _mixed_scene()
    table = scene.arrays.materials
    n = 4096
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.uniform(size=(2, n)), jnp.float32)
    root = jnp.full(n, int(scene.arrays.spheres.mat_id[0]), jnp.int32)
    m = matlib.resolve(table, root, u, depth=2)
    mt = np.asarray(table.mtype[m])
    frac = [(mt == k).mean() for k in
            (matlib.LAMBERTIAN, matlib.METAL, matlib.DIELECTRIC)]
    np.testing.assert_allclose(frac, [0.25, 0.25, 0.5], atol=0.03)


def test_render_nested_scene_finite():
    """End-to-end: a scene using BOTH nested constructs renders finitely."""
    inner = ir.Checker(ir.Constant(RED), ir.Constant(GREEN), 6.0)
    tex = ir.Checker(inner, ir.Constant((0.9, 0.9, 0.9)), 3.0)
    mat = ir.Mixed(
        ir.Mixed(ir.Lambertian(tex), ir.Metal(ir.Constant((0.8, 0.8, 0.8))),
                 0.7),
        ir.Lambertian(ir.Constant(BLUE)), 0.8)
    b = SceneBuilder()
    b.add(ir.Sphere((0, 0, -1), 0.5, mat))
    b.add(ir.Sphere((0, -100.5, -1), 100.0, ir.Lambertian(ir.Constant((0.5,) * 3))))
    scene = b.compile()
    cfg = RenderConfig(width=16, height=16, samples=4, max_depth=4)
    cam = build_camera((0, 0, 0), (0, 0, -1), fov=60,
                       width=cfg.width, height=cfg.height)
    img = np.asarray(render(scene, cam, cfg, seed=1))
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.01
