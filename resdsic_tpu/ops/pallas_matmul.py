"""Deterministic row-wise matmul and LayerNorm as Pallas kernels.

Why — the same cross-program bit-identity problem pallas_conv.py solves
for 3x3/s1 convs. TCM's decoder-side prediction path (Swin hyper
synthesis, SWAtten slice nets — ref src/compress/models/TCM/tcm.py:
139-308, 352-386) additionally contains 1x1 convs, MLP Dense layers and
LayerNorms; left to XLA, their accumulation order is a whole-program
layout/fusion decision, and the fused encoder vs the decode programs
produced different ulps at full width on TPU v5e — the host-path
fused/stepped selftest and every coded decode desynced (found by
WACNNCodec.selftest guards, round 3). A `pl.pallas_call` is compiled by
Mosaic from the kernel body + block specs alone, so the same kernel at
the same shapes yields the same artifact in every enclosing program —
deterministic by construction (see ops/pallas_conv.py's fuller
discussion).

Kernels:
  det_matmul(x, w, b): (R, Cin) x (Cin, Cout) + b, row-tiled grid, MXU
      dot with f32 accumulation. Backs 1x1/s1 convs (nn/conv.py Conv)
      and the Swin MLP Dense layers (nn/swin.py DetDense).
  det_layernorm(x, scale, bias): row-wise LN over the last axis in f32
      (fast-variance form, matching flax nn.LayerNorm), row-tiled grid.

Both wrap in jax.custom_vjp with the XLA formulation's VJP as backward
(pattern of pallas_gdn / pallas_win_attention / det_conv3x3): training
gradients are unaffected by ulp-level forward differences.

The gate is pallas_conv_enabled (RESDSIC_DET_CONV overrides) — one
switch controls the whole deterministic parameter path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_conv import pallas_conv_enabled

_VMEM_BUDGET = 12 * 1024 * 1024


# ---------------------------------------------------------------------------
# det_matmul
# ---------------------------------------------------------------------------


def _matmul_kernel(x_ref, w_ref, b_ref, o_ref, *, compute_dtype):
    acc = jnp.dot(
        x_ref[...].astype(compute_dtype),
        w_ref[...].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _row_tile(r: int, cin: int, cout: int, itemsize: int) -> int:
    """Trace-time row tiling (static shapes only, so every program tiles
    identically): largest multiple-of-8 TR whose working set (double-
    buffered in/out blocks + full weights + f32 accumulator) fits."""
    weights = cin * cout * 4

    def est(tr):
        return (
            weights
            + 2 * tr * cin * itemsize
            + 2 * tr * cout * 4
            + tr * cout * 4
        )

    tr = min(r, 4096)
    tr = -(-tr // 8) * 8
    while tr > 8 and est(tr) > _VMEM_BUDGET:
        tr = -(-(tr // 2) // 8) * 8
    return tr


def _matmul_pallas_raw(x, w, b, *, compute_dtype, interpret=False):
    r, cin = x.shape
    cout = w.shape[-1]
    tr = _row_tile(r, cin, cout, x.dtype.itemsize)
    rp = -(-r // tr) * tr
    xp = jnp.pad(x, ((0, rp - r), (0, 0))) if rp != r else x
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((rp, cout), compute_dtype),
        grid=(rp // tr,),
        in_specs=[
            pl.BlockSpec((tr, cin), lambda i: (i, 0)),
            pl.BlockSpec((cin, cout), lambda i: (0, 0)),
            pl.BlockSpec((1, cout), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tr, cout), lambda i: (i, 0)),
        interpret=interpret,
    )(xp, w, b.reshape(1, -1))
    return out[:r] if rp != r else out


def _matmul_xla(x, w, b, *, compute_dtype):
    y = jnp.dot(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return (y + b.astype(jnp.float32)).astype(compute_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def det_matmul(x, w, b, compute_dtype=jnp.float32, interpret=False):
    """Deterministic (R, Cin) x (Cin, Cout) + b matmul.

    Pallas forward (fixed artifact per shape), XLA-derived backward.
    """
    return _matmul_pallas_raw(
        x, w, b, compute_dtype=compute_dtype, interpret=interpret
    )


def _dm_fwd(x, w, b, compute_dtype, interpret):
    return det_matmul(x, w, b, compute_dtype, interpret), (x, w, b)


def _dm_bwd(compute_dtype, interpret, res, g):
    x, w, b = res

    def f(x_, w_, b_):
        return _matmul_xla(x_, w_, b_, compute_dtype=compute_dtype)

    _, vjp = jax.vjp(f, x, w, b)
    return vjp(g.astype(compute_dtype) if g.dtype != compute_dtype else g)


det_matmul.defvjp(_dm_fwd, _dm_bwd)


# ---------------------------------------------------------------------------
# det_layernorm
# ---------------------------------------------------------------------------


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (
        y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _ln_pallas_raw(x, scale, bias, *, eps, out_dtype, interpret=False):
    r, c = x.shape
    tr = _row_tile(r, c, c, 4)  # conservative: f32 working set
    rp = -(-r // tr) * tr
    xp = jnp.pad(x, ((0, rp - r), (0, 0))) if rp != r else x
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rp, c), out_dtype),
        grid=(rp // tr,),
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tr, c), lambda i: (i, 0)),
        interpret=interpret,
    )(xp, scale.reshape(1, -1), bias.reshape(1, -1))
    return out[:r] if rp != r else out


def _ln_xla(x, scale, bias, *, eps, out_dtype):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (
        y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    ).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def det_layernorm(x, scale, bias, eps=1e-6, out_dtype=jnp.float32,
                  interpret=False):
    """Deterministic LayerNorm over the last axis of a 2D (R, C) input.

    f32 statistics (fast-variance form, flax nn.LayerNorm semantics),
    Pallas forward, XLA-derived backward.
    """
    return _ln_pallas_raw(
        x, scale, bias, eps=eps, out_dtype=out_dtype, interpret=interpret
    )


def _ln_fwd(x, scale, bias, eps, out_dtype, interpret):
    return (
        det_layernorm(x, scale, bias, eps, out_dtype, interpret),
        (x, scale, bias),
    )


def _ln_bwd(eps, out_dtype, interpret, res, g):
    x, scale, bias = res

    def f(x_, s_, b_):
        return _ln_xla(x_, s_, b_, eps=eps, out_dtype=out_dtype)

    _, vjp = jax.vjp(f, x, scale, bias)
    return vjp(g)


det_layernorm.defvjp(_ln_fwd, _ln_bwd)
