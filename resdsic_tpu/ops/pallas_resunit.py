"""Fused ResidualUnit Pallas kernel: 1x1 -> gelu -> 3x3 -> gelu -> 1x1
-> (+x) -> gelu in one VMEM-resident pass.

Why — the decode-floor profile (tools/profile_gs_layers.py, v5e batch 16,
Kodak geometry) pinned g_s at 4.5 ms/img with 9.7% MFU, and the single
largest piece is WinNoShiftAttention's SIX ResidualUnits per block
(ref src/compress/layers/layers.py:52-71, used by layers.py:45-89): at
192x128xC192 the block measured 28.9 ms/batch while its attention core
alone is ~5 ms. The other ~24 ms is the residual units: each ran as three
separate conv kernels with XLA gelus between them, so every stage paid a
full HBM round-trip (~1.2 GB/unit at that shape). Fusing the whole unit
into one kernel reads x once and writes the result once (~0.3 GB/unit).

Kernel shape — follows ops/pallas_conv.py's structure: the input is
H-padded by 1 at the XLA level, split into row tiles (one pallas_call per
tile, trace-time static offsets), grid over batch. In-kernel:

    t  = gelu(x_tile @ w1 + b1)          # (TH+2, W, C/2), row-masked
    t  = zero-pad width by 1
    t2 = gelu(sum_{dy,dx} t[dy:,dx:] @ w2[dy,dx] + b2)   # valid 3x3
    o  = gelu(x_center + (t2 @ w3 + b3))

The halo rows that fall outside the image are zero in the padded input,
but stage 1 maps zero to gelu(b1) != 0 — the row mask forces them back to
zero so the 3x3 sees the exact SAME-padding semantics of the unfused path.

gelu matches nn/conv.py's dtype policy: tanh approximation under 16-bit
compute (error below bf16 resolution), exact erf under f32.

Gradients: custom_vjp with the XLA formulation's VJP as backward (the
pattern of pallas_gdn / det_conv3x3); ResidualUnit sits on the g_a/g_s
transform path, not the entropy-decision path, so ulp-level forward
differences are quality-neutral.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_VMEM_BUDGET = 12 * 1024 * 1024


def fused_resunit_enabled() -> bool:
    """Gate for the fused kernel — DEFAULT OFF.

    Measured on v5e (batch 16, 192x128xC192, bf16) the fused kernel is at
    parity with the unfused det-conv chain (3.6 vs 3.5 ms/batch, ~12% MFU
    both) — the bottleneck is not HBM round-trips at this shape, so fusion
    buys nothing yet (tools/exp_resunit.py has the variant shootout).
    Enable explicitly with RESDSIC_FUSED_RU=1.
    """
    return os.environ.get("RESDSIC_FUSED_RU", "0") not in ("0", "false", "off")


def _gelu(x):
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _resunit_kernel(
    x_ref,    # (1, TH+2, W, C)
    w1_ref,   # (C, C2)
    b1_ref,   # (1, C2)
    w2_ref,   # (3, 3, C2, C2)
    b2_ref,   # (1, C2)
    w3_ref,   # (C2, C)
    b3_ref,   # (1, C)
    o_ref,    # (1, TH, W, C)
    *,
    th: int,
    w: int,
    c: int,
    c2: int,
    lo: int,
    hi: int,
    compute_dtype,
):
    xt = x_ref[0].astype(compute_dtype)  # (TH+2, W, C)

    # stage 1: 1x1 conv + gelu over the tile incl. halo rows
    t = jnp.dot(
        xt.reshape((th + 2) * w, c),
        w1_ref[...].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    t = _gelu(t.astype(compute_dtype)).reshape(th + 2, w, c2)

    # zero halo rows outside the image (SAME-padding contract for the 3x3)
    if lo > 0 or hi < th + 2:
        rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
        t = jnp.where((rows >= lo) & (rows < hi), t, jnp.zeros_like(t))

    # width zero-pad by 1 for the valid 3x3
    zcol = jnp.zeros((th + 2, 1, c2), t.dtype)
    tp = jnp.concatenate([zcol, t, zcol], axis=1)  # (TH+2, W+2, C2)

    acc = None
    for dy in range(3):
        for dx in range(3):
            patch = tp[dy : dy + th, dx : dx + w, :].reshape(th * w, c2)
            z = jnp.dot(
                patch,
                w2_ref[dy, dx].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            acc = z if acc is None else acc + z
    t2 = _gelu((acc + b2_ref[...].astype(jnp.float32)).astype(compute_dtype))

    # stage 3: 1x1 conv + residual + gelu
    out = jnp.dot(
        t2,
        w3_ref[...].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + b3_ref[...].astype(jnp.float32)
    xc = xt[1 : th + 1].reshape(th * w, c)
    o = _gelu(out.astype(compute_dtype) + xc)
    o_ref[0] = o.reshape(th, w, c).astype(o_ref.dtype)


def _tile_heights(h: int, w: int, c: int, c2: int, itemsize: int):
    """Trace-time H-tiling: largest TH whose working set fits the budget.

    Static-shape-only so every program tiles identically (same discipline
    as ops/pallas_conv.py).
    """
    weights = (c * c2 + 9 * c2 * c2 + c2 * c) * 4

    def est(th):
        x_tile = 2 * (th + 2) * w * c * itemsize     # double-buffered in
        t = (th + 2) * w * c2 * (4 + itemsize)       # f32 acc + casted
        patch = 4 * th * w * c2 * itemsize           # shifted-slice staging
        acc2 = th * w * c2 * 4
        out = th * w * c * 4 + 2 * th * w * c * itemsize
        return weights + x_tile + t + patch + acc2 + out

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


def _resunit_pallas_raw(x, w1, b1, w2, b2, w3, b3, *, compute_dtype,
                        interpret=False):
    b, h, w, c = x.shape
    c2 = w1.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    b1r = b1.reshape(1, -1)
    b2r = b2.reshape(1, -1)
    b3r = b3.reshape(1, -1)

    def call(x_tile, th, lo, hi):
        return pl.pallas_call(
            functools.partial(
                _resunit_kernel, th=th, w=w, c=c, c2=c2, lo=lo, hi=hi,
                compute_dtype=compute_dtype,
            ),
            out_shape=jax.ShapeDtypeStruct((b, th, w, c), compute_dtype),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, th + 2, w, c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((c, c2), lambda i: (0, 0)),
                pl.BlockSpec((1, c2), lambda i: (0, 0)),
                pl.BlockSpec((3, 3, c2, c2), lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((1, c2), lambda i: (0, 0)),
                pl.BlockSpec((c2, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, w, c), lambda i: (i, 0, 0, 0)),
            interpret=interpret,
        )(x_tile, w1, b1r, w2, b2r, w3, b3r)

    tiles = _tile_heights(h, w, c, c2, x.dtype.itemsize)
    outs = []
    r0 = 0  # row offset into the H-padded input
    for th in tiles:
        # local halo row i is a real image row iff 1 <= r0 + i <= h
        lo = max(0, 1 - r0)
        hi = min(th + 2, h + 1 - r0)
        outs.append(
            call(jax.lax.slice_in_dim(xp, r0, r0 + th + 2, axis=1), th, lo, hi)
        )
        r0 += th
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _resunit_xla(x, w1, b1, w2, b2, w3, b3, *, compute_dtype):
    """Unfused reference formulation — the exact op sequence ResidualUnit
    ran before fusion (det/XLA conv + gelu chain); also the backward."""
    cdt = compute_dtype
    b_, h, w, c = x.shape
    xc = x.astype(cdt)
    t = (
        jnp.dot(xc.reshape(-1, c), w1.astype(cdt),
                preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    ).astype(cdt)
    t = _gelu(t).reshape(b_, h, w, -1)
    t = jax.lax.conv_general_dilated(
        t, w2.astype(cdt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    t = _gelu(t.astype(cdt))
    out = (
        jnp.dot(t.reshape(-1, t.shape[-1]), w3.astype(cdt),
                preferred_element_type=jnp.float32)
        + b3.astype(jnp.float32)
    ).astype(cdt)
    return _gelu(out.reshape(b_, h, w, c) + xc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_residual_unit(x, w1, b1, w2, b2, w3, b3, compute_dtype=jnp.float32,
                        interpret=False):
    """Fused bottleneck residual unit (ref layers.py:52-71).

    x: (B, H, W, C); w1: (C, C/2); w2: (3, 3, C/2, C/2) HWIO; w3: (C/2, C).
    Pallas forward (one HBM read/write of x), XLA-derived backward.
    """
    return _resunit_pallas_raw(
        x, w1, b1, w2, b2, w3, b3, compute_dtype=compute_dtype,
        interpret=interpret,
    )


def _ru_fwd(x, w1, b1, w2, b2, w3, b3, compute_dtype, interpret):
    out = fused_residual_unit(
        x, w1, b1, w2, b2, w3, b3, compute_dtype, interpret
    )
    return out, (x, w1, b1, w2, b2, w3, b3)


def _ru_bwd(compute_dtype, interpret, res, g):
    x, w1, b1, w2, b2, w3, b3 = res

    def f(x_, w1_, b1_, w2_, b2_, w3_, b3_):
        return _resunit_xla(
            x_, w1_, b1_, w2_, b2_, w3_, b3_, compute_dtype=compute_dtype
        )

    _, vjp = jax.vjp(f, x, w1, b1, w2, b2, w3, b3)
    return vjp(g.astype(compute_dtype) if g.dtype != compute_dtype else g)


fused_residual_unit.defvjp(_ru_fwd, _ru_bwd)
