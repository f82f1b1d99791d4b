"""Conditional-merge scalable codec ("cicd").

Parity target: src/compress/models/WACNN/scalable/conditional_single_decoder.py
(conditional_scalable_icd, 390 LoC): scalable_icd + a `joiner_policy`
controlling how base and progressive slices combine
(conditional_single_decoder.py:96-105):
  residual             y_main + y_prog (the icd default)
  conditional          per-slice conv stack over concat(y_main, y_prog)
  concatenation        latent = concat(all complete, all prog) — needs the
                       dual-decoder variant (cimd) to consume 2M channels
  block_concatenation  per-slice channel concat
  cac                  NOTE: broken in the reference (the ctor overwrites
                       the policy string with a Conv2d and merge() then
                       crashes, :48-53); here implemented as the evident
                       intent — a learned 1x1 MxM fusion applied to the
                       merged latent when q != 0.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...nn import Conv, gelu
from .single_decoder import ScalableICD


class ConditionalScalableICD(ScalableICD):
    joiner_policy: str = "conditional"

    def setup(self):
        super().setup()
        dt = self.dtype
        sc = self.slice_ch
        if self.joiner_policy == "conditional":
            self.joiner = [
                [
                    Conv(2 * sc, kernel_size=3, stride=1, dtype=dt), gelu,
                    Conv(2 * sc, kernel_size=3, stride=1, dtype=dt), gelu,
                    Conv(sc, kernel_size=3, stride=1, dtype=dt),
                ]
                for _ in range(self.num_slices)
            ]
        elif self.joiner_policy == "cac":
            self.cac_conv = Conv(self.M, kernel_size=1, stride=1, dtype=dt)

    def _merge(self, y_main, y_prog, slice_index: int):
        jp = self.joiner_policy
        if jp == "residual":
            return y_main + y_prog
        if jp in ("concatenation", "cac"):
            return y_main
        if jp == "block_concatenation":
            return jnp.concatenate([y_main, y_prog], axis=-1)
        support = jnp.concatenate([y_main, y_prog], axis=-1)
        return self._seq(self.joiner[slice_index], support)

    def _final_latent(self, y_hat_complete, y_hat_prog, q):
        if self.joiner_policy == "concatenation" and q != 0:
            return jnp.concatenate(
                list(y_hat_complete) + list(y_hat_prog), axis=-1
            )
        latent = jnp.concatenate(y_hat_complete, axis=-1)
        if self.joiner_policy == "cac" and q != 0:
            latent = self.cac_conv(latent)
        return latent
