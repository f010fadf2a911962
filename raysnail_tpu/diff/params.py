"""Differentiable parameter views over SceneArrays.

The north-star gradient targets are the continuous material/emitter knobs
(albedo colors, DiffuseMetal fuzz exponent, dielectric IOR, BlinnPhong lobe,
emitter intensity) — geometry gradients (silhouettes) are out of scope.
SceneParams is the float sub-pytree jax.grad differentiates; inject_params
writes it back into a SceneArrays for rendering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from raysnail_tpu.prelude.vec import Vec3
from raysnail_tpu.scene import SceneArrays


class SceneParams(NamedTuple):
    tex_color1: Vec3       # constant/checker-odd colors per texture row
    tex_color2: Vec3       # checker-even colors
    mat_param0: jax.Array  # fuzz exponent | ior | k_specular
    mat_param1: jax.Array  # BlinnPhong exponent (also dielectric schlick flag)
    emit_mult: jax.Array   # DiffuseLight multipliers
    phong_factor: jax.Array


def extract_params(arrays: SceneArrays) -> SceneParams:
    return SceneParams(
        tex_color1=arrays.textures.color1,
        tex_color2=arrays.textures.color2,
        mat_param0=arrays.materials.param0,
        mat_param1=arrays.materials.param1,
        emit_mult=arrays.materials.emit_mult,
        phong_factor=arrays.materials.phong_factor,
    )


def inject_params(arrays: SceneArrays, p: SceneParams) -> SceneArrays:
    return arrays._replace(
        textures=arrays.textures._replace(color1=p.tex_color1, color2=p.tex_color2),
        materials=arrays.materials._replace(
            param0=p.mat_param0, param1=p.mat_param1, emit_mult=p.emit_mult,
            phong_factor=p.phong_factor,
        ),
    )
