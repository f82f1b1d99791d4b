"""Deterministic 3x3 stride-1 convolution as a Pallas kernel.

Why this exists — the cross-program bit-identity problem
--------------------------------------------------------

The codec's enc/dec contract requires the decoder-side prediction
subgraphs (hyper synthesis, per-slice cc mu/scale, LRP — all 3x3/s1 conv
stacks, ref src/compress/models/WACNN/cnn.py:56-116) to produce
BIT-IDENTICAL values in separately compiled XLA programs: the fused
encoder, the stepped decoder, and the device-coded enc/dec programs each
embed the same subgraph, and a 1-ulp divergence in a predicted scale
flips a CDF row and desyncs the rANS stream.

`lax.optimization_barrier` fences (models/wacnn.py:_iso) are necessary
but not sufficient: XLA's layout assignment and conv tiling are
whole-program decisions, so the "same" barriered island can still be
lowered with different f32 accumulation orders in different programs —
observed on TPU v5e with a trained f32 WACNN (fused-vs-stepped slice
params diverged at batch 2 while matching at batch 1).

A `pl.pallas_call`, by contrast, is compiled by Mosaic from the kernel
body + grid/block specs alone — the enclosing XLA program cannot change
its internals, its operand layouts are canonical, and its accumulation
order is fixed by the kernel's own loop structure. Same kernel + same
shapes => same artifact => bit-identical results in every program. So
routing every 3x3/s1 conv through this kernel makes the whole parameter
path deterministic BY CONSTRUCTION, at full float accuracy (no integer
quantization needed).

Kernel shape
------------

One pallas_call per conv layer, grid over (batch,) per H-tile: the padded
input tile (TH+2, W+2, Cin) lives in VMEM and the conv is computed as 9
shifted (TH*W, Cin) x (Cin, Cout) MXU matmuls accumulated in f32 — the
im2col-free formulation. H-tiling (trace-time static, shape-derived only)
keeps VMEM under budget for large (CLIC-sized) latents; tile slicing and
concatenation are exact data movement, so determinism is preserved.

Measured v5e (batch 16, f32): within 0.6-1.7x of the XLA conv at the
codec's parameter-path sizes (48x32xC latents) — parity perf for
guaranteed determinism.

Gradients: `det_conv3x3` wraps the kernel in jax.custom_vjp with the XLA
conv's VJP as backward (same pattern as pallas_gdn / pallas_win_attention);
training quality is unaffected by ulp-level forward differences.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# VMEM budget per kernel instance (bytes); v5e exposes a 16 MiB scoped
# limit — the estimator below models Mosaic's real allocation (double
# buffering + patch staging), validated against an observed 21.33M
# scoped-vmem OOM at (48,128,96->96).
_VMEM_BUDGET = 12 * 1024 * 1024


def pallas_conv_enabled() -> bool:
    """Auto-gate: route 3x3/s1 convs through the deterministic kernel on TPU.

    Override with RESDSIC_DET_CONV=0 (force XLA) or =1 (force kernel, e.g.
    interpret-mode on CPU for tests).
    """
    env = os.environ.get("RESDSIC_DET_CONV")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _conv3x3_kernel(x_ref, w_ref, b_ref, o_ref, *, th, tw, cin, cout,
                    compute_dtype):
    """(1, TH+2, TW+2, Cin) -> (1, TH, TW, Cout), 9 shifted MXU matmuls."""
    xp = x_ref[0].astype(compute_dtype)
    acc = None
    for dy in range(3):
        for dx in range(3):
            patch = xp[dy:dy + th, dx:dx + tw, :].reshape(th * tw, cin)
            t = jnp.dot(
                patch,
                w_ref[dy, dx].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[0] = acc.reshape(th, tw, cout).astype(o_ref.dtype)


def _tile_heights(h: int, w: int, cin: int, cout: int, itemsize: int):
    """Trace-time H-tiling: largest TH whose working set fits the budget.

    Depends ONLY on static shapes, so every program tiles identically.
    """
    weights = 9 * cin * cout * 4

    def est(th):
        # 2x for grid double-buffering of in/out blocks; ~4 live patch
        # staging buffers for the shifted reshapes (empirical fit to
        # Mosaic's scoped-vmem accounting).
        x_tile = 2 * (th + 2) * (w + 2) * cin * itemsize
        patch = 4 * th * w * cin * itemsize
        out = 2 * th * w * cout * 4
        acc = th * w * cout * 4
        return weights + x_tile + patch + out + acc

    th = h
    while th > 8 and est(th) > _VMEM_BUDGET:
        th = (th + 1) // 2
    tiles = []
    r = h
    while r > 0:
        t = min(th, r)
        tiles.append(t)
        r -= t
    return tiles


def _conv3x3_pallas_raw(x, w, b, *, compute_dtype, interpret=False):
    bb, h, w_, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b2 = b.reshape(1, -1)

    def call(x_tile, th):
        return pl.pallas_call(
            functools.partial(
                _conv3x3_kernel, th=th, tw=w_, cin=cin, cout=cout,
                compute_dtype=compute_dtype,
            ),
            out_shape=jax.ShapeDtypeStruct((bb, th, w_, cout), compute_dtype),
            grid=(bb,),
            in_specs=[
                pl.BlockSpec((1, th + 2, w_ + 2, cin), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((1, cout), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, w_, cout), lambda i: (i, 0, 0, 0)),
            interpret=interpret,
        )(x_tile, w, b2)

    tiles = _tile_heights(h, w_, cin, cout, x.dtype.itemsize)
    if len(tiles) == 1:
        return call(xp, h)
    outs = []
    r0 = 0
    for th in tiles:
        outs.append(call(jax.lax.slice_in_dim(xp, r0, r0 + th + 2, axis=1), th))
        r0 += th
    return jnp.concatenate(outs, axis=1)


def _conv3x3_xla(x, w, b, *, compute_dtype):
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(compute_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def det_conv3x3(x, w, b, compute_dtype=jnp.float32, interpret=False):
    """Deterministic SAME 3x3/s1 conv: Pallas forward, XLA-derived backward.

    x: (B, H, W, Cin) — w: (3, 3, Cin, Cout) HWIO — b: (Cout,).
    """
    return _conv3x3_pallas_raw(
        x, w, b, compute_dtype=compute_dtype, interpret=interpret
    )


def _dc_fwd(x, w, b, compute_dtype, interpret):
    return det_conv3x3(x, w, b, compute_dtype, interpret), (x, w, b)


def _dc_bwd(compute_dtype, interpret, res, g):
    x, w, b = res

    def f(x_, w_, b_):
        return _conv3x3_xla(x_, w_, b_, compute_dtype=compute_dtype)

    _, vjp = jax.vjp(f, x, w, b)
    return vjp(g.astype(compute_dtype) if g.dtype != compute_dtype else g)


det_conv3x3.defvjp(_dc_fwd, _dc_bwd)
