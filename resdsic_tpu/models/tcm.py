"""TCM conv-transformer mixture codec.

Parity target: src/compress/models/TCM/tcm.py:310-626 (class TCM):
ConvTransBlock (parallel conv + Swin) analysis/synthesis, Swin hyper
networks, num_slices=5 channel-AR entropy model with per-slice SWAtten on
the cc-transform supports, N=128/M=320, window 8, hyper channels 192.

Inherits all forward/codec machinery from WACNN — only setup() and the
slice mu/scale hook (SWAtten insertion, tcm.py:446-455) differ, so the
fused single-dispatch codec programs and the host codec driver apply
unchanged. Present-but-unregistered in the reference registry; exposed
here as "tcm".
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..entropy import EntropyBottleneck, GaussianConditional
from ..nn import Conv, SubpelConv3x3, gelu
from ..nn.swin import (
    ConvTransBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SWAtten,
)
from .wacnn import WACNN


class TCM(WACNN):
    N: int = 128
    M: int = 320
    num_slices: int = 5
    max_support_slices: int = 5
    config: Tuple[int, ...] = (2, 2, 2, 2, 2, 2)
    head_dim: Tuple[int, ...] = (8, 16, 32, 32, 16, 8)
    drop_path_rate: float = 0.0
    window_size: int = 8
    hyper_ch: int = 192

    def setup(self):
        N, M, dt = self.N, self.M, self.dtype
        ws = self.window_size
        dpr = np.linspace(0, self.drop_path_rate, sum(self.config))

        def ctb_stage(stage: int, dim: int, win: int):
            return [
                ConvTransBlock(
                    dim, dim, self.head_dim[stage], win,
                    float(dpr[i]), "W" if not i % 2 else "SW", dtype=dt,
                )
                for i in range(self.config[stage])
            ]

        self.g_a = (
            [ResidualBlockWithStride(2 * N, stride=2, dtype=dt)]
            + ctb_stage(0, N, ws)
            + [ResidualBlockWithStride(2 * N, stride=2, dtype=dt)]
            + ctb_stage(1, N, ws)
            + [ResidualBlockWithStride(2 * N, stride=2, dtype=dt)]
            + ctb_stage(2, N, ws)
            + [Conv(M, kernel_size=3, stride=2, dtype=dt)]
        )
        self.g_s = (
            [ResidualBlockUpsample(2 * N, upsample=2, dtype=dt)]
            + ctb_stage(3, N, ws)
            + [ResidualBlockUpsample(2 * N, upsample=2, dtype=dt)]
            + ctb_stage(4, N, ws)
            + [ResidualBlockUpsample(2 * N, upsample=2, dtype=dt)]
            + ctb_stage(5, N, ws)
            + [SubpelConv3x3(3, r=2, dtype=dt)]
        )

        def ctb_hyper():
            return [
                ConvTransBlock(
                    N, N, 32, 4, 0.0, "W" if not i % 2 else "SW", dtype=dt
                )
                for i in range(self.config[0])
            ]

        self.h_a = (
            [ResidualBlockWithStride(2 * N, stride=2, dtype=dt)]
            + ctb_hyper()
            + [Conv(self.hyper_ch, kernel_size=3, stride=2, dtype=dt)]
        )
        self.h_mean_s = (
            [ResidualBlockUpsample(2 * N, upsample=2, dtype=dt)]
            + ctb_hyper()
            + [SubpelConv3x3(M, r=2, dtype=dt)]
        )
        self.h_scale_s = (
            [ResidualBlockUpsample(2 * N, upsample=2, dtype=dt)]
            + ctb_hyper()
            + [SubpelConv3x3(M, r=2, dtype=dt)]
        )

        sc = self.slice_ch  # 320//5 = 64

        self.atten_mean = [
            SWAtten(
                M + sc * min(i, 5), M + sc * min(i, 5), 16, ws, 0.0,
                inter_dim=128, dtype=dt,
            )
            for i in range(self.num_slices)
        ]
        self.atten_scale = [
            SWAtten(
                M + sc * min(i, 5), M + sc * min(i, 5), 16, ws, 0.0,
                inter_dim=128, dtype=dt,
            )
            for i in range(self.num_slices)
        ]

        def cc_stack():
            return [
                Conv(224, kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(128, kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(sc, kernel_size=3, stride=1, dtype=dt),
            ]

        self.cc_mean_transforms = [cc_stack() for _ in range(self.num_slices)]
        self.cc_scale_transforms = [cc_stack() for _ in range(self.num_slices)]
        self.lrp_transforms = [cc_stack() for _ in range(self.num_slices)]

        self.entropy_bottleneck = EntropyBottleneck(channels=self.hyper_ch)
        self.gaussian_conditional = GaussianConditional()

    def _attended_mean_support(self, idx, latent_means, support):
        """Shared island: the attended mean support must be bit-identical
        whether computed here (encode/slice_params) or in
        _lrp_mean_support (decode_step) — see WACNN._iso."""
        ms = jnp.concatenate([latent_means] + list(support), axis=-1)
        ms = self.atten_mean[idx](self._iso(ms))
        return self._iso(ms)

    def _slice_mu_scale(self, idx, latent_means, latent_scales, support):
        """TCM applies SWAtten to the supports before the cc transforms
        (tcm.py:446-455); the ATTENDED mean support feeds the LRP too."""
        latent_means, latent_scales, support = self._iso(
            (latent_means, latent_scales, list(support))
        )
        mean_support = self._attended_mean_support(idx, latent_means, support)
        mu = self._seq(self.cc_mean_transforms[idx], self._iso(mean_support))
        mu = self._iso(mu)

        scale_support = jnp.concatenate([latent_scales] + support, axis=-1)
        scale_support = self.atten_scale[idx](self._iso(scale_support))
        scale = self._seq(self.cc_scale_transforms[idx], self._iso(scale_support))
        scale = self._iso(scale)
        return mu, scale, mean_support

    def _lrp(self, idx, mean_support, y_hat_slice):
        # mean_support arrives already attended from _slice_mu_scale
        mean_support, y_hat_slice = self._iso((mean_support, y_hat_slice))
        lrp_support = jnp.concatenate([mean_support, y_hat_slice], axis=-1)
        lrp = self._seq(self.lrp_transforms[idx], lrp_support)
        return self._iso(0.5 * jnp.tanh(lrp))

    def _lrp_mean_support(self, idx, latent_means, support):
        latent_means, support = self._iso((latent_means, list(support)))
        return self._attended_mean_support(idx, latent_means, support)
