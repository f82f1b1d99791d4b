"""Scalable single-decoder codec with mask-in-coding ("icd").

Parity target: src/compress/models/WACNN/scalable/single_decoder.py
(scalable_icd, 773 LoC). Structurally identical to the independent model
(full prog hyperprior) but:
  * masking is the standalone Mask module (layers/mask_layer.py) with the
    richer policy set (learnable-mask-gamma/nested, point-based-std,
    two-levels, scalable_res)
  * the mask PARTICIPATES in coding: prog likelihoods use scale·mask
    (single_decoder.py:455-459) and the transmitted symbols are the masked
    zero-mean residual round((y_prog−mu)·mask) with indexes built from
    scale·mask (single_decoder.py:613-622)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...nn.mask import Mask
from .independent import ResWACNNIndependentEntropy


class ScalableICD(ResWACNNIndependentEntropy):
    mask_policy: str = "learnable-mask-gamma"
    lmbda_list: tuple = (0.0035, 0.065)

    def setup(self):
        # skip the shared-variant's learnable-mask params ("learnable-mask"
        # belongs to the shared/ind family; icd uses the Mask module)
        super().setup()
        self.masking = Mask(
            mask_policy=self.mask_policy,
            scalable_levels=self.scalable_levels,
            M=self.M,
            dtype=self.dtype,
        )

    @property
    def uses_coding_mask(self) -> bool:
        return True

    def _prog_mask(self, latent_scales, scales_prog, q, training):
        if q == 0:
            return None
        mask = self.masking(latent_scales, scale_prog=scales_prog, pr=q)
        if "learnable-mask" in self.mask_policy:
            mask = self.masking.apply_noise(mask, training)
        return mask

    def compute_mask(self, latent_scales, scales_prog, q) -> jax.Array:
        """Decoder-recomputable rounded mask (codec path,
        ref single_decoder.py:517-519) — deterministic island, see
        ResWACNNSharedEntropy._coding_mask."""
        return self._coding_mask(latent_scales, scales_prog, q)
