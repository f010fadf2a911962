"""Differentiable rendering: pixel-radiance gradients w.r.t. material and
emitter parameters, and the inverse-rendering train step."""

from raysnail_tpu.diff.params import SceneParams, extract_params, inject_params
from raysnail_tpu.diff.train import make_loss_fn, make_train_step

__all__ = ["SceneParams", "extract_params", "inject_params",
           "make_loss_fn", "make_train_step"]
