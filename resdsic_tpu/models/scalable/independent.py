"""Scalable WACNN with a fully independent progressive hyperprior ("ind",
the reference's DEFAULT model).

Parity target: src/compress/models/WACNN/scalable/independent.py
(ResWACNNIndependentEntropy, 760 LoC): on top of the shared-entropy
skeleton it adds h_a_prog / h_mean_s_prog / h_scale_s_prog and independent
per-slice cc transforms for the progressive branch, an optional independent
LRP stack (`independent_lrp`), an optional pair of full decoders
(`multiple_decoder`, g_s[0] for base-only / g_s[1] for base+prog), and a
`lrp_prog` switch.

All coding-path device programs are inherited from the shared base — only
the prog-plumbing hooks are overridden, so the host codec driver is
identical for both variants.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import GDN, Conv, Deconv, SubpelConv3x3, WinNoShiftAttention, gelu
from ..wacnn import _cc_widths, _hyper_widths
from .shared import ResWACNNSharedEntropy


class ResWACNNIndependentEntropy(ResWACNNSharedEntropy):
    """Independent progressive hyperprior scalable codec ("ind")."""

    def setup(self):
        super().setup()
        N, M, dt = self.N, self.M, self.dtype
        hw = _hyper_widths(M, self.hyper_channels)

        self.h_a_prog = [
            Conv(hw[0], kernel_size=3, stride=1, dtype=dt), gelu,
            Conv(hw[1], kernel_size=3, stride=1, dtype=dt), gelu,
            Conv(hw[2], kernel_size=3, stride=2, dtype=dt), gelu,
            Conv(hw[3], kernel_size=3, stride=1, dtype=dt), gelu,
            Conv(hw[4], kernel_size=3, stride=2, dtype=dt),
        ]
        self.h_mean_s_prog = [
            Conv(hw[4], kernel_size=3, stride=1, dtype=dt), gelu,
            SubpelConv3x3(hw[3], r=2, dtype=dt), gelu,
            Conv(hw[2], kernel_size=3, stride=1, dtype=dt), gelu,
            SubpelConv3x3(hw[1], r=2, dtype=dt), gelu,
            Conv(hw[0], kernel_size=3, stride=1, dtype=dt),
        ]
        self.h_scale_s_prog = [
            Conv(hw[4], kernel_size=3, stride=1, dtype=dt), gelu,
            SubpelConv3x3(hw[3], r=2, dtype=dt), gelu,
            Conv(hw[2], kernel_size=3, stride=1, dtype=dt), gelu,
            SubpelConv3x3(hw[1], r=2, dtype=dt), gelu,
            Conv(hw[0], kernel_size=3, stride=1, dtype=dt),
        ]

        cw = _cc_widths(M)
        sc = self.slice_ch

        def cc_stack():
            return [
                Conv(cw[0], kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(cw[1], kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(cw[2], kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(cw[3], kernel_size=3, stride=1, dtype=dt), gelu,
                Conv(sc, kernel_size=3, stride=1, dtype=dt),
            ]

        self.cc_mean_transforms_prog = [cc_stack() for _ in range(self.num_slices)]
        self.cc_scale_transforms_prog = [cc_stack() for _ in range(self.num_slices)]
        if self.independent_lrp:
            self.lrp_transforms_prog = [cc_stack() for _ in range(self.num_slices)]

        if self.multiple_decoder:
            def decoder(dim):
                return [
                    WinNoShiftAttention(dim=dim, num_heads=8, window_size=4, shift_size=2, dtype=dt),
                    Deconv(N, kernel_size=5, stride=2, dtype=dt),
                    GDN(inverse=True, dtype=dt),
                    Deconv(N, kernel_size=5, stride=2, dtype=dt),
                    GDN(inverse=True, dtype=dt),
                    WinNoShiftAttention(dim=N, num_heads=8, window_size=8, shift_size=4, dtype=dt),
                    Deconv(N, kernel_size=5, stride=2, dtype=dt),
                    GDN(inverse=True, dtype=dt),
                    Deconv(3, kernel_size=5, stride=2, dtype=dt),
                ]

            # decoder input dim may differ per decoder (cimd concatenation:
            # conditional_multiple_decoder.py:41 dimensions_M)
            self.g_s_multi = [
                decoder(self._decoder_dim(i)) for i in range(2)
            ]

    def _decoder_dim(self, decoder_index: int) -> int:
        return self.M

    # ---- independent progressive plumbing (overrides shared reuse) ----

    def _h_a_prog(self, y_prog: jax.Array) -> jax.Array:
        return self._seq(self.h_a_prog, y_prog)

    def _hyper_synth_prog(self, z_hat_prog) -> Tuple[jax.Array, jax.Array]:
        # deterministic island (see WACNN._iso)
        z_hat_prog = self._iso(z_hat_prog)
        out = (
            self._seq(self.h_mean_s_prog, z_hat_prog),
            self._seq(self.h_scale_s_prog, z_hat_prog),
        )
        return self._iso(out)

    def _cc_prog(self, i: int):
        return self.cc_mean_transforms_prog[i], self.cc_scale_transforms_prog[i]

    def _lrp_prog_stack(self, i: int):
        if self.independent_lrp:
            return self.lrp_transforms_prog[i]
        return self.lrp_transforms[i]

    def _synthesize_q(self, y_hat: jax.Array, q) -> jax.Array:
        if self.multiple_decoder:
            return self._seq(self.g_s_multi[0 if q == 0 else 1], y_hat)
        return self._seq(self.g_s, y_hat)
