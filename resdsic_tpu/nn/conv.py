"""Convolution building blocks (NHWC, torch-shape-compatible padding).

Parity targets (reference):
  - conv/deconv factories: src/compress/models/WACNN/utils.py:46-134
  - conv3x3/conv1x1/subpel_conv3x3: src/compress/layers/layers.py:29-43

Padding follows the reference's torch conventions (pad = k//2 both sides;
deconv: stride-2 transposed conv with output_padding = stride-1) so converted
checkpoints produce identical spatial maps. All convs run in NHWC — the
TPU-native layout — with an optional compute dtype (bf16) while params stay
f32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas_conv import _conv3x3_xla, det_conv3x3, pallas_conv_enabled
from ..ops.pallas_matmul import _matmul_xla, det_matmul

Dtype = Any


class _Conv3x3S1(nn.Module):
    """3x3 stride-1 conv with a deterministic Pallas execution path.

    Param layout (kernel HWIO + bias under this module's scope) matches
    nn.Conv exactly, so checkpoints and torch converters are unaffected.
    On TPU the forward runs as a Pallas kernel (ops/pallas_conv.py) whose
    compiled artifact is independent of the enclosing XLA program —
    required for the codec's cross-program bit-identity contract.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_params: bool = False):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
            jnp.float32,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        else:
            bias = jnp.zeros((self.features,), jnp.float32)
        if return_params:
            # fused callers gather weights without computing; params are
            # created under the same names either way
            return kernel, bias
        if pallas_conv_enabled():
            return det_conv3x3(x, kernel, bias, self.dtype)
        return _conv3x3_xla(x, kernel, bias, compute_dtype=self.dtype)


class _Conv1x1S1(nn.Module):
    """1x1 stride-1 conv with a deterministic Pallas matmul path.

    Same contract as _Conv3x3S1: param layout (kernel (1,1,Cin,Cout) HWIO
    + bias) matches nn.Conv exactly; on TPU the forward is a fixed Pallas
    matmul artifact (ops/pallas_matmul.py) so separately compiled codec
    programs agree bit-for-bit. TCM's decode-relevant path (ConvTransBlock
    mixers, SWAtten in/out/gate convs, residual 1x1 skips — ref
    tcm.py:238-287) is built from these.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_params: bool = False):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.features),
            jnp.float32,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        else:
            bias = jnp.zeros((self.features,), jnp.float32)
        if return_params:
            return kernel.reshape(cin, self.features), bias
        b, h, w, _ = x.shape
        x2 = x.reshape(b * h * w, cin)
        w2 = kernel.reshape(cin, self.features)
        if pallas_conv_enabled():
            y = det_matmul(x2, w2, bias, self.dtype)
        else:
            y = _matmul_xla(x2, w2, bias, compute_dtype=self.dtype)
        return y.reshape(b, h, w, self.features)


class Conv(nn.Module):
    """2D convolution, torch-style symmetric padding k//2.

    The 3x3/stride-1 and 1x1/stride-1 cases route through deterministic
    Pallas kernels on TPU (see _Conv3x3S1/_Conv1x1S1) — every decoder-side
    prediction transform in the codec (hyper synthesis, cc mu/scale, LRP,
    TCM swin/attention mixers) is built from these.
    """

    features: int
    kernel_size: int = 5
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_params: bool = False):
        if self.kernel_size == 3 and self.stride == 1 and x.ndim == 4:
            return _Conv3x3S1(
                self.features, use_bias=self.use_bias, dtype=self.dtype,
                name="conv",
            )(x, return_params=return_params)
        if self.kernel_size == 1 and self.stride == 1 and x.ndim == 4:
            return _Conv1x1S1(
                self.features, use_bias=self.use_bias, dtype=self.dtype,
                name="conv",
            )(x, return_params=return_params)
        assert not return_params, "return_params only for 3x3/1x1 stride-1"
        p = self.kernel_size // 2
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


def _deconv_fold(c12: int, width: int) -> int:
    """Column-fold factor for narrow-output subpixel deconvs.

    Auto (RESDSIC_DECONV_FOLD unset): fold 8 when the packed channel
    count is far below one 128-wide MXU tile and the input width
    divides; env values force a factor (0/1 disables)."""
    import os

    env = os.environ.get("RESDSIC_DECONV_FOLD")
    if env is not None:
        fold = max(1, int(env))
    else:
        fold = 8 if c12 <= 48 else 1
    while fold > 1 and width % fold:
        fold //= 2
    return fold


class Deconv(nn.Module):
    """2D transposed convolution, exact torch ConvTranspose2d semantics.

    Implemented as an input-dilated convolution (lhs_dilation = stride) with
    asymmetric padding (k-1-p, k-1-p+output_padding) and a spatially-flipped
    kernel — the unambiguous formulation that maps 1:1 onto XLA and onto the
    reference's deconv helper (WACNN/utils.py).
    Output size: (H-1)*stride - 2p + k + output_padding with p = k//2,
    output_padding = stride-1  →  exactly H*stride.
    """

    features: int
    kernel_size: int = 5
    stride: int = 2
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s = self.kernel_size, self.stride
        p = k // 2
        in_ch = x.shape[-1]

        # Kernel stored HWIO for the equivalent correlation (already flipped
        # relative to torch's ConvTranspose weight; converter handles that).
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
            jnp.float32,
        )
        if s == 1:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1, 1),
                padding=((k - 1 - p,) * 2, (k - 1 - p,) * 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = self._subpixel(x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y

    def _subpixel(self, x: jax.Array, kernel: jax.Array) -> jax.Array:
        """Phase-decomposed transposed conv: a DENSE conv + pixel shuffle.

        The naive lhs_dilated formulation makes the MXU contract against a
        ~(s^2-1)/s^2-zeros input and tiles badly for narrow outputs (the
        final 192->3 deconv ran at 1.4% MFU). Mathematically the dilated
        conv splits by output phase r in [0,s)^2: each phase only touches
        kernel taps m === (pad_lo - r) mod s, i.e.

            y[s*q + r] = sum_u W[s*u + m0_r] * x[q + u + e_r],
            m0_r = (pad_lo - r) % s,  e_r = (r + m0_r - pad_lo) / s

        — an ordinary dense conv per phase. All s^2 phases pack into ONE
        conv with features*s^2 outputs (zero-padded taps) followed by
        pixel_shuffle (channel order o*s^2 + ra*s + rb matches the shuffle's
        (c, i, j) layout). Same products, same per-output summation ranks —
        values match the dilated form to float round-off.
        """
        k, s, f = self.kernel_size, self.stride, self.features
        pad_lo = k - 1 - k // 2
        in_ch = x.shape[-1]

        m0 = [(pad_lo - r) % s for r in range(s)]
        n_taps = [-(-(k - m0[r]) // s) for r in range(s)]
        e = [(r + m0[r] - pad_lo) // s for r in range(s)]
        E = min(e)
        U = max(n_taps[r] + e[r] - E for r in range(s))

        packed = jnp.zeros((U, U, in_ch, f * s * s), kernel.dtype)
        for ra in range(s):
            for rb in range(s):
                sub = kernel[m0[ra] :: s, m0[rb] :: s]  # (n_a, n_b, in, f)
                ua, ub = e[ra] - E, e[rb] - E
                packed = packed.at[
                    ua : ua + sub.shape[0],
                    ub : ub + sub.shape[1],
                    :,
                    (ra * s + rb) :: s * s,
                ].set(sub)

        c12 = f * s * s
        fold = _deconv_fold(c12, x.shape[2])
        if fold > 1:
            # NARROW-OUTPUT column folding (tools/exp_deconv3.py v1/v2):
            # with c12 = f*s^2 output channels far below the 128-wide MXU
            # tile (the final 192->3 deconv has 12 — ~3% MFU), band the
            # kernel so `fold` adjacent output-x positions come out as
            # channels: W'[a, b, :, j*c12 + o] = packed[a, b - j, :, o],
            # window stride (1, fold). Identical products and summation
            # order per output element — exact vs the dense form; the
            # reshape unfolds columns back before the pixel shuffle.
            wide = jnp.zeros(
                (U, U + fold - 1, in_ch, c12 * fold), packed.dtype
            )
            for j in range(fold):
                wide = wide.at[
                    :, j : j + U, :, j * c12 : (j + 1) * c12
                ].set(packed)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                wide.astype(self.dtype),
                window_strides=(1, fold),
                padding=((-E, U - 1 + E), (-E, U - 1 + E + fold - 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            b_, h_, wf, _ = y.shape
            y = y.reshape(b_, h_, wf * fold, c12)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                packed.astype(self.dtype),
                window_strides=(1, 1),
                padding=((-E, U - 1 + E), (-E, U - 1 + E)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # packed channel index o*s^2 + ra*s + rb == pixel_shuffle's (c, i, j)
        return pixel_shuffle(y, s)


def conv(out_ch: int, kernel_size: int = 5, stride: int = 2, dtype=jnp.float32):
    return Conv(out_ch, kernel_size=kernel_size, stride=stride, dtype=dtype)


def deconv(out_ch: int, kernel_size: int = 5, stride: int = 2, dtype=jnp.float32):
    return Deconv(out_ch, kernel_size=kernel_size, stride=stride, dtype=dtype)


def conv3x3(out_ch: int, stride: int = 1, dtype=jnp.float32):
    return Conv(out_ch, kernel_size=3, stride=stride, dtype=dtype)


def conv1x1(out_ch: int, stride: int = 1, dtype=jnp.float32):
    return Conv(out_ch, kernel_size=1, stride=stride, dtype=dtype)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """Depth-to-space with torch PixelShuffle channel ordering.

    Input (B, H, W, C*r*r) with channel index c*r*r + i*r + j maps to
    output (B, H*r, W*r, C) at (h*r+i, w*r+j, c).
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, i, W, j, C
    return x.reshape(b, h * r, w * r, c)


class SubpelConv3x3(nn.Module):
    """3x3 conv + pixel shuffle upsampling (ref layers.py:34-38)."""

    features: int
    r: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = Conv(
            self.features * self.r**2, kernel_size=3, stride=1,
            dtype=self.dtype, name="conv",
        )(x)
        return pixel_shuffle(y, self.r)


def subpel_conv3x3(out_ch: int, r: int = 1, dtype=jnp.float32):
    return SubpelConv3x3(out_ch, r=r, dtype=dtype)


class Sequential(nn.Module):
    """Apply a list of modules/callables in order (named layers_{i})."""

    layers: Sequence[Callable]

    @nn.compact
    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x


def gelu(x: jax.Array) -> jax.Array:
    """GELU matching torch nn.GELU (exact erf) in f32.

    Under 16-bit compute dtypes the tanh approximation is used instead: its
    error (~3e-4 absolute) is below bf16 resolution (rel eps 2^-8), while
    the erf lowering costs ~26x more VPU time on TPU v5e (measured 1.11 ms
    vs 0.04 ms for a (16,192,128,96) map) — exactness that the dtype cannot
    represent is not worth the cycles."""
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)
