"""Swin-transformer blocks for the TCM codec + CompressAI-style residual
blocks.

Parity targets:
  - WMSA / Block / ConvTransBlock / SWAtten / SwinBlock:
      src/compress/models/TCM/tcm.py:139-308
  - ResidualBlock / ResidualBlockWithStride / ResidualBlockUpsample /
      AttentionBlock: CompressAI upstream layers imported at tcm.py:4-11
      (API pinned by call sites; implemented fresh here).

All NHWC. SW-MSA masks are built with numpy at trace time (static shapes).
Known reference bug NOT replicated: SwinBlock's small-input padding never
unpads (tcm.py:296-307 `resize` stays False); we pad and unpad correctly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.pallas_win_attention import (
    pallas_attention_enabled,
    window_attention as fused_window_attention,
    xla_window_attention,
)
from .attention import _DenseParams

from ..ops.math import NonNegativeParametrizer
from ..ops.pallas_conv import pallas_conv_enabled
from ..ops.pallas_matmul import (
    _ln_xla,
    _matmul_xla,
    det_layernorm,
    det_matmul,
)
from .conv import Conv, SubpelConv3x3, conv1x1, conv3x3, gelu
from .gdn import GDN

Dtype = Any


class DetLayerNorm(nn.Module):
    """LayerNorm with a deterministic Pallas execution path on TPU.

    Param tree ({scale, bias}, f32) and semantics match nn.LayerNorm
    (eps 1e-6, fast-variance f32 statistics) so checkpoints/converters are
    unaffected. Needed because XLA lowers the LN reduction with program-
    dependent accumulation order, which broke the codec's cross-program
    bit-identity contract in TCM's prediction path (see
    ops/pallas_matmul.py).
    """

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x2 = x.reshape(-1, c)
        if pallas_conv_enabled():
            y = det_layernorm(x2, scale, bias, self.epsilon, self.dtype)
        else:
            y = _ln_xla(x2, scale, bias, eps=self.epsilon,
                        out_dtype=self.dtype)
        return y.reshape(x.shape)


class DetDense(nn.Module):
    """Dense layer with a deterministic Pallas matmul path on TPU.

    Param tree ({kernel, bias}, f32) and init match nn.Dense; same
    cross-program determinism rationale as DetLayerNorm.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        x2 = x.reshape(-1, cin)
        if pallas_conv_enabled():
            y = det_matmul(x2, kernel, bias, self.dtype)
        else:
            y = _matmul_xla(x2, kernel, bias, compute_dtype=self.dtype)
        return y.reshape(*x.shape[:-1], self.features)


def _leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


class ResidualBlock(nn.Module):
    """conv3x3 → lrelu → conv3x3 → lrelu (+ 1x1 skip if channels change)."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = conv3x3(self.out_ch, dtype=self.dtype)(x)
        out = _leaky_relu(out)
        out = conv3x3(self.out_ch, dtype=self.dtype)(out)
        out = _leaky_relu(out)
        identity = x
        if in_ch != self.out_ch:
            identity = conv1x1(self.out_ch, dtype=self.dtype)(x)
        return out + identity


class ResidualBlockWithStride(nn.Module):
    """conv3x3(s) → lrelu → conv3x3 → GDN (+ strided 1x1 skip)."""

    out_ch: int
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = conv3x3(self.out_ch, stride=self.stride, dtype=self.dtype)(x)
        out = _leaky_relu(out)
        out = conv3x3(self.out_ch, dtype=self.dtype)(out)
        out = GDN(dtype=self.dtype)(out)
        if self.stride != 1 or in_ch != self.out_ch:
            identity = conv1x1(self.out_ch, stride=self.stride, dtype=self.dtype)(x)
        else:
            identity = x
        return out + identity


class ResidualBlockUpsample(nn.Module):
    """subpel conv up → lrelu → conv3x3 → IGDN (+ subpel skip)."""

    out_ch: int
    upsample: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = SubpelConv3x3(self.out_ch, r=self.upsample, dtype=self.dtype)(x)
        out = _leaky_relu(out)
        out = conv3x3(self.out_ch, dtype=self.dtype)(out)
        out = GDN(inverse=True, dtype=self.dtype)(out)
        identity = SubpelConv3x3(self.out_ch, r=self.upsample, dtype=self.dtype)(x)
        return out + identity


class _ReluResidualUnit(nn.Module):
    """CompressAI AttentionBlock residual unit (ReLU, bottleneck N/2)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.dim
        out = conv1x1(n // 2, dtype=self.dtype)(x)
        out = jax.nn.relu(out)
        out = conv3x3(n // 2, dtype=self.dtype)(out)
        out = jax.nn.relu(out)
        out = conv1x1(n, dtype=self.dtype)(out)
        return jax.nn.relu(out + x)


class AttentionBlock(nn.Module):
    """Cheng2020-style attention: out = x + conv_a(x)·σ(conv_b(x))."""

    N: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.conv_a = [
            _ReluResidualUnit(self.N, dtype=self.dtype) for _ in range(3)
        ]
        self.conv_b_units = [
            _ReluResidualUnit(self.N, dtype=self.dtype) for _ in range(3)
        ]
        self.conv_b_out = Conv(self.N, kernel_size=1, stride=1, dtype=self.dtype)

    def _branch_a(self, x):
        for u in self.conv_a:
            x = u(x)
        return x

    def _branch_b(self, x):
        for u in self.conv_b_units:
            x = u(x)
        return self.conv_b_out(x)

    def __call__(self, x):
        a = self._branch_a(x)
        b = self._branch_b(x)
        return x + a * jax.nn.sigmoid(b)


def _sw_mask(h_windows: int, w_windows: int, p: int, shift: int) -> np.ndarray:
    """TCM generate_mask (tcm.py:160-177): True = blocked. Returns
    (nW, p*p, p*p) boolean, trace-time numpy."""
    mask = np.zeros((h_windows, w_windows, p, p, p, p), dtype=bool)
    s = p - shift
    mask[-1, :, :s, :, s:, :] = True
    mask[-1, :, s:, :, :s, :] = True
    mask[:, -1, :, :s, :, s:] = True
    mask[:, -1, :, s:, :, :s] = True
    return mask.reshape(h_windows * w_windows, p * p, p * p)


class WMSA(nn.Module):
    """TCM window MSA (tcm.py:139-212); param layout matches the reference
    (relative_position_params stored (nH, 2w-1, 2w-1)) for conversion."""

    input_dim: int
    output_dim: int
    head_dim: int
    window_size: int
    type: str = "W"
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None  # None = auto (TPU backend)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        ws = self.window_size
        # clamp to >= 1 head: test-size configs shrink input_dim below the
        # reference's hardcoded hyper head_dim=32 (tcm.py:352-374)
        nh = max(1, self.input_dim // self.head_dim)
        scale = self.head_dim**-0.5

        rel_params = self.param(
            "relative_position_params",
            nn.initializers.truncated_normal(stddev=0.02),
            (nh, 2 * ws - 1, 2 * ws - 1),
            jnp.float32,
        )

        del scale  # derived inside the shared attention paths

        # pad to window multiples (zero pad bottom/right, unpad after):
        # a no-op at production geometries (pad ×64 guarantees multiples);
        # only degenerate tiny inputs (hyper latents of test-size images)
        # take it — the reference crashes there (tcm.py:171 reshape), so
        # this is robustness, not a parity-visible behavior
        ph, pw = (-h) % ws, (-w) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw

        if self.type != "W":
            x = jnp.roll(x, shift=(-(ws // 2), -(ws // 2)), axis=(1, 2))

        hw, ww = hp // ws, wp // ws
        n = ws * ws
        xw = x.reshape(b, hw, ws, ww, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * hw * ww, n, c)

        # params shared by the XLA and fused-Pallas paths (tree/init
        # identical to the nn.Dense modules they replace)
        wqkv, bqkv = _DenseParams(
            3 * self.input_dim, name="embedding_layer"
        )(c)
        wproj, bproj = _DenseParams(self.output_dim, name="linear")(
            self.input_dim
        )

        # relative position embedding (tcm.py relative_embedding)
        coords = np.array(
            [[i, j] for i in range(ws) for j in range(ws)], dtype=np.int64
        )
        relation = coords[:, None, :] - coords[None, :, :] + ws - 1
        rel = rel_params[:, relation[:, :, 0], relation[:, :, 1]]  # nh N N

        if self.type != "W":
            # additive form of the blocked-position mask: -inf survives
            # the bias add and zeroes out exactly under softmax
            mask = jnp.asarray(
                np.where(
                    _sw_mask(hw, ww, ws, ws // 2), -np.inf, 0.0
                ).astype(np.float32)
            )
        else:
            mask = None

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = pallas_attention_enabled()
        if use_pallas:
            out = fused_window_attention(
                xw, wqkv, bqkv, wproj, bproj, rel, mask, nh, hw * ww,
            )
        else:
            out = xla_window_attention(
                xw, wqkv, bqkv, wproj, bproj, rel, mask,
                num_heads=nh, compute_dtype=self.dtype,
            )

        out = out.reshape(b, hw, ww, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, -1)

        if self.type != "W":
            out = jnp.roll(out, shift=(ws // 2, ws // 2), axis=(1, 2))
        if ph or pw:
            out = out[:, :h, :w]
        return out


class SwinTransformerBlock(nn.Module):
    """LN → WMSA → (+) → LN → MLP(4x, GELU) → (+) (tcm.py Block, :214-236)."""

    input_dim: int
    output_dim: int
    head_dim: int
    window_size: int
    drop_path: float = 0.0
    type: str = "W"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        def maybe_drop(r):
            if self.drop_path <= 0.0 or deterministic:
                return r
            keep = 1.0 - self.drop_path
            mask_shape = (r.shape[0],) + (1,) * (r.ndim - 1)
            keep_mask = jax.random.bernoulli(
                self.make_rng("droppath"), keep, mask_shape
            )
            return r * keep_mask / keep

        h = DetLayerNorm(dtype=self.dtype, name="ln1")(x)
        h = WMSA(
            self.input_dim, self.input_dim, self.head_dim,
            self.window_size, self.type, dtype=self.dtype, name="msa",
        )(h)
        x = x + maybe_drop(h)
        h = DetLayerNorm(dtype=self.dtype, name="ln2")(x)
        h = DetDense(4 * self.input_dim, dtype=self.dtype, name="mlp_0")(h)
        h = gelu(h)
        h = DetDense(self.output_dim, dtype=self.dtype, name="mlp_2")(h)
        return x + maybe_drop(h)


class ConvTransBlock(nn.Module):
    """Parallel conv-residual + Swin branch with 1x1 mixers
    (tcm.py:238-264)."""

    conv_dim: int
    trans_dim: int
    head_dim: int
    window_size: int
    drop_path: float = 0.0
    type: str = "W"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        total = self.conv_dim + self.trans_dim
        mixed = Conv(total, kernel_size=1, stride=1, dtype=self.dtype,
                     name="conv1_1")(x)
        conv_x = mixed[..., : self.conv_dim]
        trans_x = mixed[..., self.conv_dim :]

        conv_x = ResidualBlock(self.conv_dim, dtype=self.dtype,
                               name="conv_block")(conv_x) + conv_x
        trans_x = SwinTransformerBlock(
            self.trans_dim, self.trans_dim, self.head_dim, self.window_size,
            self.drop_path, self.type, dtype=self.dtype, name="trans_block",
        )(trans_x, deterministic=deterministic)

        res = Conv(total, kernel_size=1, stride=1, dtype=self.dtype,
                   name="conv1_2")(
            jnp.concatenate([conv_x, trans_x], axis=-1)
        )
        return x + res


class SwinBlock(nn.Module):
    """W + SW block pair with small-input padding (tcm.py:289-308; padding
    bug fixed — we unpad)."""

    input_dim: int
    output_dim: int
    head_dim: int
    window_size: int
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        ws = self.window_size
        padded = False
        if h <= ws or w <= ws:
            # per-dim non-negative pads: the reference pads both dims
            # whenever either is small (tcm.py:296-300), which goes
            # negative on mixed tall/narrow inputs — clamp each dim
            # independently (WMSA additionally self-pads to window
            # multiples, so this only needs to give the SW shift room)
            pr = max(0, (ws - h) // 2)
            pc = max(0, (ws - w) // 2)
            pr2 = pr + 1 if h <= ws else 0
            pc2 = pc + 1 if w <= ws else 0
            x = jnp.pad(x, ((0, 0), (pr, pr2), (pc, pc2), (0, 0)))
            padded = True
        out = SwinTransformerBlock(
            self.input_dim, self.output_dim, self.head_dim, ws,
            self.drop_path, "W", dtype=self.dtype, name="block_1",
        )(x, deterministic=deterministic)
        out = SwinTransformerBlock(
            self.input_dim, self.output_dim, self.head_dim, ws,
            self.drop_path, "SW", dtype=self.dtype, name="block_2",
        )(out, deterministic=deterministic)
        if padded:
            out = out[:, pr : pr + h, pc : pc + w, :]
        return out


class SWAtten(nn.Module):
    """AttentionBlock with a Swin non-local branch on 1x1-projected features
    (tcm.py:266-287)."""

    input_dim: int
    output_dim: int
    head_dim: int
    window_size: int
    drop_path: float = 0.0
    inter_dim: Optional[int] = 192
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        dim = self.inter_dim if self.inter_dim is not None else self.input_dim
        if self.inter_dim is not None:
            x = Conv(dim, kernel_size=1, stride=1, dtype=self.dtype,
                     name="in_conv")(x)
        identity = x
        z = SwinBlock(
            dim, dim, self.head_dim, self.window_size, self.drop_path,
            dtype=self.dtype, name="non_local_block",
        )(x, deterministic=deterministic)
        a = x
        for i in range(3):
            a = _ReluResidualUnit(dim, dtype=self.dtype, name=f"conv_a_{i}")(a)
        b = z
        for i in range(3):
            b = _ReluResidualUnit(dim, dtype=self.dtype, name=f"conv_b_{i}")(b)
        b = Conv(dim, kernel_size=1, stride=1, dtype=self.dtype,
                 name="conv_b_out")(b)
        out = a * jax.nn.sigmoid(b) + identity
        if self.inter_dim is not None:
            out = Conv(self.output_dim, kernel_size=1, stride=1,
                       dtype=self.dtype, name="out_conv")(out)
        return out
