"""Rate-distortion losses (parity: src/compress/training/loss.py).

Pure functions of (output_dict, target) — jit-traceable, f32 accumulation.
Tensors are NHWC; scalable outputs are stacked (num_levels, B, H, W, 3).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp


def _sum_log_likelihood(lik: jax.Array) -> jax.Array:
    return jnp.sum(jnp.log(lik.astype(jnp.float32)))


class RateDistortionLoss:
    """λ·255²·MSE + bpp (ref loss.py:6-30)."""

    def __init__(self, lmbda: float = 0.05):
        self.lmbda = lmbda

    def __call__(
        self, output: Dict, target: jax.Array, lmbda: Optional[float] = None
    ) -> Dict[str, jax.Array]:
        n, h, w, _ = target.shape
        num_pixels = n * h * w
        if lmbda is None:
            lmbda = self.lmbda

        out = {}
        out["bpp_loss"] = sum(
            _sum_log_likelihood(l) / (-math.log(2) * num_pixels)
            for l in output["likelihoods"].values()
        )
        out["mse_loss"] = jnp.mean(
            (output["x_hat"].astype(jnp.float32) - target) ** 2
        )
        out["loss"] = lmbda * 255**2 * out["mse_loss"] + out["bpp_loss"]
        return out


class ScalableRateDistortionLoss:
    """Two-layer RD loss (ref loss.py:33-86).

    loss = bpp_scalable + num_levels·bpp_base + 255²·mean(λ_i · mse_i)
    where mse_i is the per-level MSE of the stacked x_hat against the target.
    """

    def __init__(self, lmbda_list: Sequence[float] = (0.75,), weight: float = 255**2):
        self.lmbda = jnp.asarray(list(lmbda_list), jnp.float32)
        self.weight = weight

    def __call__(
        self, output: Dict, target: jax.Array, lmbda=None
    ) -> Dict[str, jax.Array]:
        n, h, w, _ = target.shape
        num_pixels = n * h * w
        num_levels = output["x_hat"].shape[0]

        lmbda_v = self.lmbda if lmbda is None else jnp.asarray(lmbda, jnp.float32)

        extend = jnp.broadcast_to(
            target[None], (num_levels,) + target.shape
        ).astype(jnp.float32)
        mse = jnp.mean(
            (extend - output["x_hat"].astype(jnp.float32)) ** 2,
            axis=(1, 2, 3, 4),
        )  # (num_levels,)

        lik = output["likelihoods"]
        denom = -math.log(2) * num_pixels
        out = {}
        out["mse_loss"] = mse
        out["bpp_hype_base"] = _sum_log_likelihood(lik["z"]) / denom
        out["bpp_main_base"] = _sum_log_likelihood(lik["y"]) / denom
        out["bpp_base"] = out["bpp_main_base"] + out["bpp_hype_base"]
        out["bpp_hype_scale"] = _sum_log_likelihood(lik["z_prog"]) / denom
        out["bpp_main_scale"] = _sum_log_likelihood(lik["y_prog"]) / denom
        out["bpp_scalable"] = out["bpp_main_scale"] + out["bpp_hype_scale"]
        out["bpp_loss"] = out["bpp_scalable"] + num_levels * out["bpp_base"]
        out["loss"] = out["bpp_loss"] + self.weight * jnp.mean(lmbda_v * mse)
        return out
