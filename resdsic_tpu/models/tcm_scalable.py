"""Scalable TCM codecs (base + progressive layer over the TCM backbone).

Parity target: src/compress/models/TCM/scalable/{tcm_shared_entropy.py,
independent_entropy.py} (SharedTCM + TCM-flavor ResWACNNIndependentEntropy).

NOTE — the reference TCM-scalable module is non-functional as shipped:
independent_entropy.py imports `ResWACNNSharedEntropy` from
tcm_shared_entropy (which only defines `SharedTCM`) and calls
split_ga/concatenate/extract_mask methods that SharedTCM never defines;
SharedTCM's own halve=8 geometry is inconsistent with the TCM g_a split
(the ↓4 feature has 2N channels, so a 64x channel-to-space factor cannot
apply). We implement the evident intent with consistent geometry:

  * split g_a after index `level`=5 (through m_down2's ConvTransBlocks):
    feature at ↓4 with 2N channels
  * halve=4, factor=16: depth-to-space the 2N-channel ↓4 feature to
    2N/16 channels at full resolution, concatenated with the input
    (T = 2N/16 + 3)
  * g_a_progressive mirrors the reference SharedTCM (RBWS(T→2N) + the
    three m_down stages)
  * SharedTCM reuses h_a / hyper synthesis / cc transforms for the prog
    branch; ScalableTCM adds an independent prog hyperprior (WACNN-style
    conv3x3 chains M→hyper_ch(192), like the reference's broken intent).

All multi-quality forward, mask, and fused codec machinery is inherited
from the scalable WACNN family via cooperative MRO — the TCM backbone's
SWAtten slice hooks resolve through the same overridable surface.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..nn import Conv
from ..nn.swin import ConvTransBlock, ResidualBlockWithStride
from .scalable.independent import ResWACNNIndependentEntropy
from .scalable.shared import ResWACNNSharedEntropy
from .tcm import TCM


class _TCMScalableGeometry:
    """Geometry + progressive-encoder overrides for the TCM backbone."""

    @property
    def halve(self) -> int:
        return 4

    @property
    def level(self) -> int:
        # through m_down2's ConvTransBlocks → ↓4, 2N channels
        # (g_a layout: [RBWS] + c0 CTBs + [RBWS] + c1 CTBs + ...)
        return self.config[0] + self.config[1] + 1

    @property
    def split_channels(self) -> int:
        return 2 * self.N

    def _build_g_a_progressive(self):
        N, M, dt = self.N, self.M, self.dtype
        ws = self.window_size

        def ctb_stage(stage: int):
            return [
                ConvTransBlock(
                    N, N, self.head_dim[stage], ws, 0.0,
                    "W" if not i % 2 else "SW", dtype=dt,
                )
                for i in range(self.config[stage])
            ]

        return (
            [ResidualBlockWithStride(2 * N, stride=2, dtype=dt)]
            + ctb_stage(0)
            + [ResidualBlockWithStride(2 * N, stride=2, dtype=dt)]
            + ctb_stage(1)
            + [ResidualBlockWithStride(2 * N, stride=2, dtype=dt)]
            + ctb_stage(2)
            + [Conv(M, kernel_size=3, stride=2, dtype=dt)]
        )


class SharedTCM(_TCMScalableGeometry, ResWACNNSharedEntropy, TCM):
    """TCM + shared-entropy progressive layer (ref SharedTCM)."""

    mask_policy: str = "learnable-mask"
    lmbda_list: Tuple[float, ...] = (0.0035, 0.065)


class ScalableTCM(_TCMScalableGeometry, ResWACNNIndependentEntropy, TCM):
    """TCM + independent progressive hyperprior (ref TCM-flavor
    ResWACNNIndependentEntropy, repaired)."""

    mask_policy: str = "two-levels"
    lmbda_list: Tuple[float, ...] = (0.0035, 0.065)
