"""Fused shifted-window attention Pallas kernel (W-MSA / SW-MSA).

Replaces the XLA einsum chain in nn/attention.py:WindowAttention for the
codec hot path (ref: src/compress/layers/win_attention.py:37-115, used by
layers.py:45-89 and models/TCM/tcm.py:139-212).

Why a kernel: at WACNN's first attention stage (batch 16, 192x128 spatial,
C=192, 8x8 windows) the XLA formulation materializes the (B*nW, nh, N, N)
attention-logit tensor in HBM — ~800 MB written and re-read around the
softmax — while the attention itself is only ~20% of the stage's FLOPs.
Fusing qkv-projection + per-window scaled-dot-product (+ relative-position
bias + shift mask) + softmax + value-weighting + output projection into one
VMEM-resident kernel removes that traffic entirely: per window tile the
kernel reads x once from HBM and writes the attended output once.

Layout: windows arrive as (B*nW, N, C) with N = ws*ws (64 or 16). The grid
is (B, nW // WT): each step processes WT whole windows = WT*N rows, so the
qkv and proj matmuls run at (WT*N, C) x (C, 3C) MXU-friendly shapes, and the
per-head attention runs as WT-batched (N, hd) x (hd, N) dot_generals that
never leave VMEM. The shift mask block for a tile is indexed by the window
position within the image (mask period = nW), which the 2D grid makes a
pure BlockSpec index_map.

Measured on v5e (batch 16, Kodak 768x512 geometry, bf16): win8 C192
14.6ms -> 5.2ms (2.8x), win4 C320 1.17ms -> 0.48ms (2.4x), f32 win8
20.8ms -> 6.2ms (3.4x); max |diff| vs XLA 4e-3 at activation max ~0.7
(bf16 rounding).

Gradient support: `window_attention` wraps the kernel in jax.custom_vjp —
forward runs the Pallas kernel, backward re-derives the VJP of the XLA
formulation at the saved inputs (same pattern as pallas_gdn).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def pallas_attention_enabled() -> bool:
    """Auto-gate: the fused kernel compiles only for real TPU backends.

    Override with RESDSIC_PALLAS_ATTN=0 (force XLA) or =1 (force kernel,
    e.g. under interpret-mode testing).
    """
    env = os.environ.get("RESDSIC_PALLAS_ATTN")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pick_wt(n_win_per_image: int, n_rows_per_window: int, target_rows: int = 1024) -> int:
    """Largest divisor of nW whose tile is <= target_rows rows."""
    best = 1
    for wt in range(1, n_win_per_image + 1):
        if n_win_per_image % wt == 0 and wt * n_rows_per_window <= target_rows:
            best = wt
    return best


def _attn_kernel(
    x_ref,      # (WT*N, C)
    wqkv_ref,   # (C, 3C)
    bqkv_ref,   # (1, 3C)
    wproj_ref,  # (C, C)
    bproj_ref,  # (1, C)
    bias_ref,   # (nh, N, N) f32
    *refs,      # optional mask_ref (WT, N, N) f32, then o_ref
    num_heads: int,
    n: int,
    wt: int,
    compute_dtype,
):
    if len(refs) == 2:
        mask_ref, o_ref = refs
    else:
        (o_ref,) = refs
        mask_ref = None

    c = wqkv_ref.shape[-1] // 3  # attention width (may differ from x's C)
    hd = c // num_heads
    scale = hd ** -0.5

    x = x_ref[:].astype(compute_dtype)
    qkv = (
        jnp.dot(x, wqkv_ref[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
        + bqkv_ref[:]
    ).astype(compute_dtype)  # (WT*N, 3C)

    mask = mask_ref[:] if mask_ref is not None else None

    head_outs = []
    for h in range(num_heads):
        q = qkv[:, h * hd:(h + 1) * hd].reshape(wt, n, hd)
        k = qkv[:, c + h * hd: c + (h + 1) * hd].reshape(wt, n, hd)
        v = qkv[:, 2 * c + h * hd: 2 * c + (h + 1) * hd].reshape(wt, n, hd)

        attn = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (WT, N, N) f32
        attn = attn + bias_ref[h][None]
        if mask is not None:
            attn = attn + mask
        attn = jax.nn.softmax(attn, axis=-1).astype(compute_dtype)

        o3 = jax.lax.dot_general(
            attn, v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (WT, N, hd)
        head_outs.append(o3.astype(compute_dtype).reshape(wt * n, hd))

    out = jnp.concatenate(head_outs, axis=-1)  # (WT*N, C)
    res = (
        jnp.dot(out, wproj_ref[:].astype(compute_dtype),
                preferred_element_type=jnp.float32)
        + bproj_ref[:]
    )
    o_ref[:] = res.astype(o_ref.dtype)


def fused_window_attention(
    xw: jax.Array,          # (B*nW, N, C) partitioned windows
    wqkv: jax.Array,        # (C, 3C)
    bqkv: jax.Array,        # (3C,)
    wproj: jax.Array,       # (C, C)
    bproj: jax.Array,       # (C,)
    rel_bias: jax.Array,    # (nh, N, N) f32 (bias_table already gathered)
    mask,                   # (nW, N, N) f32 or None
    *,
    num_heads: int,
    num_win_per_image: int,
    compute_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """One-pass W-MSA over pre-partitioned windows.

    Returns (B*nW, N, C_out) where C_out = wproj.shape[1]; the attention
    width C_attn = wqkv.shape[1] // 3 may differ from the input C (TCM's
    WMSA projects input_dim -> output_dim)."""
    b_, n, c_in = xw.shape
    c_attn = wqkv.shape[1] // 3
    c_out = wproj.shape[1]
    nw = num_win_per_image
    assert b_ % nw == 0, (b_, nw)
    assert wqkv.shape[0] == c_in and wproj.shape[0] == c_attn
    b = b_ // nw
    if compute_dtype is None:
        compute_dtype = xw.dtype

    wt = _pick_wt(nw, n)
    grid = (b, nw // wt)
    rows = wt * n

    x2 = xw.reshape(b_ * n, c_in)
    bqkv2 = bqkv.reshape(1, -1).astype(jnp.float32)
    bproj2 = bproj.reshape(1, -1).astype(jnp.float32)
    rel_bias = rel_bias.astype(jnp.float32)

    n_j = nw // wt
    in_specs = [
        pl.BlockSpec((rows, c_in), lambda i, j: (i * n_j + j, 0)),
        pl.BlockSpec((c_in, 3 * c_attn), lambda i, j: (0, 0)),
        pl.BlockSpec((1, 3 * c_attn), lambda i, j: (0, 0)),
        pl.BlockSpec((c_attn, c_out), lambda i, j: (0, 0)),
        pl.BlockSpec((1, c_out), lambda i, j: (0, 0)),
        pl.BlockSpec((num_heads, n, n), lambda i, j: (0, 0, 0)),
    ]
    args = [x2, wqkv, bqkv2, wproj, bproj2, rel_bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((wt, n, n), lambda i, j: (j, 0, 0)))
        args.append(mask.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel,
            num_heads=num_heads,
            n=n,
            wt=wt,
            compute_dtype=compute_dtype,
        ),
        out_shape=jax.ShapeDtypeStruct((b_ * n, c_out), xw.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, c_out), lambda i, j: (i * n_j + j, 0)),
        interpret=interpret,
    )(*args)
    return out.reshape(b_, n, c_out)


def xla_window_attention(xw, wqkv, bqkv, wproj, bproj, rel_bias, mask,
                         *, num_heads, compute_dtype=None):
    """Reference einsum-chain W-MSA over (B*nW, N, C) windows — the XLA
    path the kernel replaces; also the source of the backward pass."""
    b_, n, _ = xw.shape
    nh = num_heads
    c = wqkv.shape[1] // 3
    hd = c // nh
    scale = hd ** -0.5
    cdt = compute_dtype or xw.dtype
    qkv = (xw.astype(cdt) @ wqkv.astype(cdt) + bqkv.astype(cdt)).astype(cdt)
    qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + rel_bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
        attn = attn.reshape(b_, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(cdt)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=cdt)
    out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
    return (out.astype(cdt) @ wproj.astype(cdt) + bproj.astype(cdt)).astype(
        xw.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def window_attention(xw, wqkv, bqkv, wproj, bproj, rel_bias, mask,
                     num_heads, num_win_per_image, interpret=False):
    """Differentiable fused W-MSA: Pallas forward, XLA-derived backward.

    mask may be None (W-MSA) or (nW, N, N) f32 (SW-MSA). All positional
    array args participate in autodiff except mask (a trace-time constant).
    """
    return fused_window_attention(
        xw, wqkv, bqkv, wproj, bproj, rel_bias, mask,
        num_heads=num_heads, num_win_per_image=num_win_per_image,
        interpret=interpret,
    )


def _wa_fwd(xw, wqkv, bqkv, wproj, bproj, rel_bias, mask,
            num_heads, num_win_per_image, interpret):
    out = window_attention(xw, wqkv, bqkv, wproj, bproj, rel_bias, mask,
                           num_heads, num_win_per_image, interpret)
    return out, (xw, wqkv, bqkv, wproj, bproj, rel_bias, mask)


def _wa_bwd(num_heads, num_win_per_image, interpret, res, g):
    xw, wqkv, bqkv, wproj, bproj, rel_bias, mask = res

    def f(xw_, wqkv_, bqkv_, wproj_, bproj_, rel_bias_):
        return xla_window_attention(
            xw_, wqkv_, bqkv_, wproj_, bproj_, mask=mask,
            rel_bias=rel_bias_, num_heads=num_heads,
        )

    _, vjp = jax.vjp(f, xw, wqkv, bqkv, wproj, bproj, rel_bias)
    return vjp(g) + (None,)


window_attention.defvjp(_wa_fwd, _wa_bwd)
