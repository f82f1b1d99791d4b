"""Standalone latent-masking module (parity: src/compress/layers/mask_layer.py).

Policies:
  point-based-std       keep the top-pr fraction of positions by base scale
  learnable-mask-gamma  sigmoid(conv(cat(scale, scale_prog))) ^ Σ relu(gamma)
  learnable-mask-nested sigmoid of summed per-level sigmoid convs
  two-levels            all-zero (q=0) / all-one (q≠0)
  scalable_res          channel-block progressive (top channels first)

`pr` is the normalized quality level (int index for learnable/scalable_res,
fraction in [0,1] for point-based-std).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conv import Conv
from ..ops.math import ste_round


class Mask(nn.Module):
    mask_policy: str
    scalable_levels: int
    M: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.mask_policy == "learnable-mask-gamma":
            self.gamma = self.param(
                "gamma",
                lambda k, s: jnp.ones(s, jnp.float32),
                (self.scalable_levels - 2, self.M),
            )
            self.mask_conv = Conv(self.M, kernel_size=1, stride=1, dtype=self.dtype)
        elif self.mask_policy == "learnable-mask-nested":
            self.mask_conv = [
                Conv(self.M, kernel_size=1, stride=1, dtype=self.dtype)
                for _ in range(self.scalable_levels - 2)
            ]

    def apply_noise(self, mask: jax.Array, training: bool) -> jax.Array:
        """Differentiable rounding of soft masks (ref mask_layer.py:33-39)."""
        if training:
            noise = jax.random.uniform(
                self.make_rng("noise"), mask.shape, mask.dtype, -0.5, 0.5
            )
            return ste_round(mask + noise)
        return jnp.round(mask)

    def __call__(
        self,
        scale: jax.Array,
        scale_prog: Optional[jax.Array] = None,
        pr=0,
        mask_pol: Optional[str] = None,
    ) -> jax.Array:
        if mask_pol is None:
            mask_pol = self.mask_policy

        if mask_pol == "point-based-std":
            if pr == 1.0:
                return jnp.ones_like(scale)
            if pr == 0.0:
                return jnp.zeros_like(scale)
            quantile = jnp.quantile(
                scale.astype(jnp.float32).ravel(), 1.0 - pr
            )
            return (scale >= quantile).astype(jnp.float32)

        if mask_pol == "learnable-mask-gamma":
            if pr == 0:
                return jnp.zeros_like(scale)
            if pr == self.scalable_levels - 1:
                return jnp.ones_like(scale)
            assert scale_prog is not None
            inp = jnp.concatenate([scale, scale_prog], axis=-1)
            importance = jax.nn.sigmoid(self.mask_conv(inp))
            index_pr = int(self.scalable_levels - 1 - pr)
            gamma = jax.nn.relu(jnp.sum(self.gamma[:index_pr], axis=0)) + 1e-7
            return jnp.power(importance, gamma[None, None, None, :])

        if mask_pol == "learnable-mask-nested":
            # NOTE: the reference (mask_layer.py:92-107) returns ones at pr==1
            # and indexes range(pr) into a (levels-2)-long conv list — which
            # raises IndexError for any pr>=2. We implement the evident
            # intent, consistent with the gamma variant: zeros at pr==0, ones
            # at the top level, and a nested sum of the first pr sigmoid
            # convs in between (pr in 1..levels-2 uses convs 0..pr-1).
            if pr == 0:
                return jnp.zeros_like(scale)
            if pr == self.scalable_levels - 1:
                return jnp.ones_like(scale)
            assert scale_prog is not None
            inp = jnp.concatenate([scale, scale_prog], axis=-1)
            s = sum(
                jax.nn.sigmoid(self.mask_conv[i](inp)) for i in range(int(pr))
            )
            return jax.nn.sigmoid(s)

        if mask_pol == "two-levels":
            if pr == 0:
                return jnp.zeros_like(scale)
            return jnp.ones_like(scale)

        if mask_pol == "scalable_res":
            if pr == 0:
                return jnp.zeros_like(scale)
            if pr == self.scalable_levels - 1:
                return jnp.ones_like(scale)
            # channel-block progressive; the reference hardcodes 32-wide
            # blocks for M=320 (mask_layer.py:122) — scale proportionally
            block = max(1, self.M // 10)
            lv = max(0, self.M - block * int(pr) * 2)
            mask = jnp.zeros_like(scale)
            return mask.at[..., lv:].set(1.0)

        raise NotImplementedError(mask_pol)
