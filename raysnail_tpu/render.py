"""L6 execution engine: the painter equivalent.

The reference's Painter owns pixel iteration, stratified sampling, row-
interleaved threading, and streaming (src/painter.rs). Here the whole frame is
a handful of device dispatches: each dispatch renders ALL pixels for a chunk
of stratification cells (static shapes), and sample chunks accumulate into an
f32 radiance-sum framebuffer. Multi-pass adaptive oversampling and tiling
across a device mesh build on this in render passes / parallel modules.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raysnail_tpu import integrator
from raysnail_tpu import scene as scenelib
from raysnail_tpu.camera import Camera, generate_rays
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.prelude import color as colorlib
from raysnail_tpu.prelude import rng as prng
from raysnail_tpu.prelude.vec import Vec3


def make_sample_step(scene: scenelib.Scene, cfg: RenderConfig):
    """Build the jitted per-chunk render step.

    step(arrays, camera, key, sample_ids) -> radiance sums, shape (H*W,) Vec3,
    where sample_ids is a static-length chunk of stratification cell indices
    in [0, sqrt_spp^2)."""
    w, h = cfg.width, cfg.height
    sqrt_spp = cfg.sqrt_spp

    @jax.jit
    def step(arrays: scenelib.SceneArrays, camera: Camera, key, sample_ids):
        py, px = jnp.meshgrid(
            jnp.arange(h, dtype=cfg.dtype), jnp.arange(w, dtype=cfg.dtype),
            indexing="ij",
        )
        px = px.ravel()
        py = py.ravel()

        def one_sample(sid):
            s_i = (sid % sqrt_spp).astype(cfg.dtype)
            s_j = (sid // sqrt_spp).astype(cfg.dtype)
            ks = jax.random.fold_in(key, sid)
            ray = generate_rays(
                camera, px, py,
                jnp.full_like(px, s_i), jnp.full_like(py, s_j),
                sqrt_spp, w, h, ks,
            )
            return integrator.radiance(scene, arrays, cfg, ray, ks)

        sums = jax.lax.map(one_sample, sample_ids)  # (k, H*W) Vec3
        return sums.map(lambda a: jnp.sum(a, axis=0))

    return step


def render(scene: scenelib.Scene, camera: Camera, cfg: RenderConfig,
           seed: int = 0,
           arrays: Optional[scenelib.SceneArrays] = None,
           progress: Optional[Callable[[int, int], None]] = None) -> np.ndarray:
    """Render a full frame -> (H, W, 3) float32 display image (gamma applied).

    `arrays` may override scene.arrays (e.g. perturbed differentiable params).
    `progress(done_samples, total_samples)` streams completion like the
    reference's PainterTarget row callback."""
    spp = cfg.effective_samples
    step = make_sample_step(scene, cfg)
    arrays = arrays if arrays is not None else scene.arrays
    key = prng.key(seed)

    # chunk stratification cells so each dispatch stays within ray_batch rays;
    # k divides spp so every chunk has the same static length (one trace)
    n_pix = cfg.width * cfg.height
    k_max = max(1, min(spp, cfg.ray_batch // max(n_pix, 1)))
    k = max(d for d in range(1, k_max + 1) if spp % d == 0)
    accum = None
    for start in range(0, spp, k):
        ids = jnp.arange(start, start + k, dtype=jnp.int32)
        sums = step(arrays, camera, key, ids)
        accum = sums if accum is None else accum + sums
        if progress is not None:
            progress(min(spp, start + k), spp)

    img = colorlib.into_color(accum, float(spp), cfg.gamma)
    return np.asarray(img.to_array()).reshape(cfg.height, cfg.width, 3)
