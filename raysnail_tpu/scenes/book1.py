"""Book-1 final scene: the random-balls field (reference examples/common/
scene.rs:23-208 + examples/rtow_13_1.rs).

Layout replicates the reference's generator formulae exactly — 22x22 jittered
grid, 80/15/5 diffuse/metal/glass mix, bounce heights, avoid bands, three big
balls, checker ground, and rtow_13_1's light sphere + sky gradient. The
reference seeds a Rust StdRng (ChaCha12) whose stream we can't reproduce
bit-for-bit in numpy, so the same seed gives a *statistically identical*
scene, not the identical ball placement (SURVEY.md sect.7 "stochastic
equivalence").
"""

from __future__ import annotations

import numpy as np

from raysnail_tpu import ir
from raysnail_tpu.camera import build_camera
from raysnail_tpu.scene import SceneBuilder


def add_small_balls(builder: SceneBuilder, rng: np.random.Generator,
                    bounce_height: float = 0.9, need_speed: bool = False):
    """scene.rs:23-76. `rng.normal()` in the reference is uniform [0,1)."""
    r = 0.2
    for a in range(-11, 11):
        for b in range(-11, 11):
            center = np.array([
                0.9 * rng.random() + a,
                0.2 + rng.random() * bounce_height,
                0.9 * rng.random() + b,
            ])
            ax = abs(center[0])
            avoid = np.array([center[0], 0.2, 0.0])
            in_band = (0.0 <= ax < 0.9) or (3.1 <= ax < 4.9)
            if (not in_band) or np.linalg.norm(center - avoid) >= 0.9:
                mat_u = rng.random()
                if mat_u < 0.8:
                    color = (rng.random(), rng.random(), rng.random())
                    material = ir.Lambertian(ir.Constant(color))
                elif mat_u < 0.95:
                    color = tuple(0.5 + 0.5 * rng.random() for _ in range(3))
                    fuzz = rng.random() * 0.5
                    if fuzz < 0.1:
                        material = ir.Metal(ir.Constant(color))
                    else:
                        material = ir.DiffuseMetal(fuzz * 1000.0, ir.Constant(color))
                else:
                    material = ir.Dielectric((1.0, 1.0, 1.0), 1.5, schlick=True)
                speed = (0.0, rng.random() * 0.5, 0.0) if need_speed else (0.0, 0.0, 0.0)
                builder.add(ir.Sphere(tuple(center), r, material, speed=speed))


def add_big_balls(builder: SceneBuilder):
    """scene.rs:137-160."""
    builder.add(ir.Sphere((0.0, 1.0, 0.0), 1.0, ir.Dielectric((1, 1, 1), 1.5, schlick=True)))
    builder.add(ir.Sphere((-4.0, 1.0, 0.0), 1.0, ir.Lambertian(ir.Constant((0.4, 0.2, 0.1)))))
    builder.add(ir.Sphere((4.0, 1.0, 0.0), 1.0, ir.Metal(ir.Constant((0.7, 0.6, 0.5)))))


def balls_scene(seed: int = 7, need_speed: bool = False, checker: bool = True,
                with_light: bool = True) -> SceneBuilder:
    """scene.rs:162-191 (+ rtow_13_1.rs light and sky)."""
    builder = SceneBuilder()
    if checker:
        ground = ir.Lambertian(ir.Checker(ir.Constant((0.3, 0.3, 0.3)),
                                          ir.Constant((0.1, 0.1, 0.1)), 10.0))
    else:
        ground = ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))
    builder.add(ir.Sphere((0.0, -1000.0, 0.0), 1000.0, ground))

    rng = np.random.default_rng(seed)
    add_small_balls(builder, rng, 0.9, need_speed)
    add_big_balls(builder)

    if with_light:
        builder.add(
            ir.Sphere((300.0, 400.0, 100.0), 12.0,
                      ir.DiffuseLight(ir.Constant((1.0, 0.9, 0.7)), 1.5)),
            light=True,
        )
    # rtow_13_1.rs:41-45 sky
    builder.set_background((0.3, 0.4, 0.5), (0.7, 0.89, 1.0))
    return builder


def balls_camera(width: int, height: int, need_shutter: bool = False):
    """scene.rs:193-208: 13,2,3 -> origin, fov 20, aperture 0.02, focus 10."""
    return build_camera(
        look_from=(13.0, 2.0, 3.0), look_at=(0.0, 0.0, 0.0), fov=20.0,
        aperture=0.02, focus_distance=10.0,
        shutter_speed=1.0 if need_shutter else 0.0,
        width=width, height=height,
    )
