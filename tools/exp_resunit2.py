"""Isolate where ResidualUnit kernel time goes: MXU vs VPU(gelu) vs layout.

Variants on the v1 (c2pad=128) kernel @ (16,192,128,192) bf16:
  a  full v1 (gelu)
  b  relu instead of gelu           -> VPU transcendental cost
  c  no activation at all           -> pure matmul+layout
  d  only stage-2 (9 matmuls)       -> 3x3 core cost
  e  only stages 1+3 (two 1x1)      -> big matmul cost
  f  single (rows,192)@(192,192) matmul kernel, same tiling -> baseline

Run: PYTHONPATH=/root/.axon_site:. python tools/exp_resunit2.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 16, 192, 128, 192
C2P = 128
DT = jnp.bfloat16
K1, K2 = 4, 16
REPS = 3
TH = 24  # fixed tile height (v1 picked 24)


def _act(x, mode):
    if mode == "gelu":
        return jax.nn.gelu(x, approximate=True)
    if mode == "relu":
        return jnp.maximum(x, 0)
    return x


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
            *, th, w, c, c2p, act, stages):
    xt = x_ref[0].astype(DT)  # (TH+2, W, C)

    if "1" in stages:
        t = jnp.dot(xt.reshape((th + 2) * w, c), w1_ref[...].astype(DT),
                    preferred_element_type=jnp.float32) + b1_ref[...]
        t = _act(t.astype(DT), act).reshape(th + 2, w, c2p)
    else:
        t = xt[:, :, :c2p]

    if "2" in stages:
        zcol = jnp.zeros((th + 2, 1, c2p), t.dtype)
        tp = jnp.concatenate([zcol, t, zcol], axis=1)
        acc = None
        for dy in range(3):
            for dx in range(3):
                patch = tp[dy:dy + th, dx:dx + w, :].reshape(th * w, c2p)
                z = jnp.dot(patch, w2_ref[dy, dx].astype(DT),
                            preferred_element_type=jnp.float32)
                acc = z if acc is None else acc + z
        t2 = _act((acc + b2_ref[...]).astype(DT), act)
    else:
        t2 = t[1:th + 1].reshape(th * w, c2p)

    if "3" in stages:
        out = jnp.dot(t2, w3_ref[...].astype(DT),
                      preferred_element_type=jnp.float32) + b3_ref[...]
        xc = xt[1:th + 1].reshape(th * w, c)
        o = _act(out.astype(DT) + xc, act)
    else:
        o = jnp.pad(t2, ((0, 0), (0, c - c2p)))
    o_ref[0] = o.reshape(th, w, c).astype(o_ref.dtype)


def run_variant(x, weights, act, stages):
    w1, b1, w2, b2, w3, b3 = weights
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    def call(x_tile):
        return pl.pallas_call(
            functools.partial(_kernel, th=TH, w=W, c=C, c2p=C2P, act=act,
                              stages=stages),
            out_shape=jax.ShapeDtypeStruct((B, TH, W, C), DT),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, TH + 2, W, C), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((C, C2P), lambda i: (0, 0)),
                pl.BlockSpec((1, C2P), lambda i: (0, 0)),
                pl.BlockSpec((3, 3, C2P, C2P), lambda i: (0, 0, 0, 0)),
                pl.BlockSpec((1, C2P), lambda i: (0, 0)),
                pl.BlockSpec((C2P, C), lambda i: (0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TH, W, C), lambda i: (i, 0, 0, 0)),
        )(x_tile, w1, b1, w2, b2, w3, b3)

    outs = []
    for r0 in range(0, H, TH):
        outs.append(call(jax.lax.slice_in_dim(xp, r0, r0 + TH + 2, axis=1)))
    return jnp.concatenate(outs, axis=1)


def _kernel_g(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
              *, th, w, c, c2p):
    """Same math as _kernel act=gelu, but fed from a halo-replicated input
    (B, n_tiles, TH+2, W, C) so ONE pallas_call with grid (B, n_tiles)
    covers the whole map — tests whether the 8-sequential-calls structure
    (per-call pipeline drain) is the cost."""
    xt = x_ref[0, 0].astype(DT)
    t = jnp.dot(xt.reshape((th + 2) * w, c), w1_ref[...].astype(DT),
                preferred_element_type=jnp.float32) + b1_ref[...]
    t = jax.nn.gelu(t.astype(DT), approximate=True).reshape(th + 2, w, c2p)
    zcol = jnp.zeros((th + 2, 1, c2p), t.dtype)
    tp = jnp.concatenate([zcol, t, zcol], axis=1)
    acc = None
    for dy in range(3):
        for dx in range(3):
            patch = tp[dy:dy + th, dx:dx + w, :].reshape(th * w, c2p)
            z = jnp.dot(patch, w2_ref[dy, dx].astype(DT),
                        preferred_element_type=jnp.float32)
            acc = z if acc is None else acc + z
    t2 = jax.nn.gelu((acc + b2_ref[...]).astype(DT), approximate=True)
    out = jnp.dot(t2, w3_ref[...].astype(DT),
                  preferred_element_type=jnp.float32) + b3_ref[...]
    xc = xt[1:th + 1].reshape(th * w, c)
    o = jax.nn.gelu(out.astype(DT) + xc, approximate=True)
    o_ref[0, 0] = o.reshape(th, w, c).astype(o_ref.dtype)


def run_g(x, weights):
    """Halo-replicate x at the XLA level (one gather, ~1.08x copy), then a
    single pallas_call with grid (B, n_tiles). Halo rows outside the image
    are zeros from the pad, matching SAME semantics (interior tiles only
    here: H % TH == 0 and gelu-mask skipped — fine for timing; the masked
    row fix costs nothing extra as measured by variant a vs c)."""
    w1, b1, w2, b2, w3, b3 = weights
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    nt = H // TH
    # (B, nt, TH+2, W, C) overlapping tiles
    idx = (jnp.arange(nt) * TH)[:, None] + jnp.arange(TH + 2)[None]
    xt = xp[:, idx]  # gather over H
    return pl.pallas_call(
        functools.partial(_kernel_g, th=TH, w=W, c=C, c2p=C2P),
        out_shape=jax.ShapeDtypeStruct((B, nt, TH, W, C), DT),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, TH + 2, W, C), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((C, C2P), lambda i, j: (0, 0)),
            pl.BlockSpec((1, C2P), lambda i, j: (0, 0)),
            pl.BlockSpec((3, 3, C2P, C2P), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec((1, C2P), lambda i, j: (0, 0)),
            pl.BlockSpec((C2P, C), lambda i, j: (0, 0)),
            pl.BlockSpec((1, C), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TH, W, C), lambda i, j: (i, j, 0, 0, 0)
        ),
    )(xt, w1, b1, w2, b2, w3, b3).reshape(B, H, W, C)


def _matmul_kernel(x_ref, w_ref, o_ref):
    o_ref[0] = (
        jnp.dot(x_ref[0].reshape(-1, C).astype(DT), w_ref[...].astype(DT),
                preferred_element_type=jnp.float32)
        .astype(DT).reshape(TH + 2, W, C)
    )


def run_matmul(x, wmm):
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    outs = []
    for r0 in range(0, H, TH):
        outs.append(pl.pallas_call(
            _matmul_kernel,
            out_shape=jax.ShapeDtypeStruct((B, TH + 2, W, C), DT),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, TH + 2, W, C), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((C, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TH + 2, W, C), lambda i: (i, 0, 0, 0)),
        )(jax.lax.slice_in_dim(xp, r0, r0 + TH + 2, axis=1), wmm))
    return jnp.concatenate(outs, axis=1)


def _looped(fn, k):
    # cheap feedback: single-element update + partial sum, so harness
    # overhead stays ~10us/iter instead of a full-array add (~0.5 ms at
    # this shape); variant h times the harness alone for subtraction
    def looped(x):
        def body(i, carry):
            x_in, acc = carry
            out = fn(x_in)
            s = jnp.sum(out[:, :2].astype(jnp.float32))
            return (x_in.at[0, 0, 0, 0].add((1e-12 * s).astype(x_in.dtype)),
                    acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    return jax.jit(looped)


def _time(fn, x):
    float(fn(x))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(x))
    return (time.perf_counter() - t0) / REPS


def bench(name, fn, x):
    t1 = _time(_looped(fn, K1), x)
    t2 = _time(_looped(fn, K2), x)
    dt = max((t2 - t1) / (K2 - K1), 1e-9)
    print(f"{name:44s} {dt*1e3:8.2f} ms/batch", flush=True)
    return dt


def main():
    print(f"# backend={jax.default_backend()}")
    ks = jax.random.split(jax.random.key(0), 8)
    x = jax.random.normal(ks[0], (B, H, W, C), DT)
    weights = (
        (jax.random.normal(ks[1], (C, C2P), jnp.float32) * 0.05),
        jnp.zeros((1, C2P), jnp.float32),
        (jax.random.normal(ks[2], (3, 3, C2P, C2P), jnp.float32) * 0.05),
        jnp.zeros((1, C2P), jnp.float32),
        (jax.random.normal(ks[3], (C2P, C), jnp.float32) * 0.05),
        jnp.zeros((1, C), jnp.float32),
    )
    wmm = jax.random.normal(ks[4], (C, C), jnp.float32) * 0.05

    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "bcdefh"
    if "h" in which:
        bench("h harness only (identity)", lambda x_: x_, x)
    if "b" in which:
        bench("b full (relu)",
              lambda x_: run_variant(x, weights, "relu", "123"), x)
    if "c" in which:
        bench("c full (no act)",
              lambda x_: run_variant(x, weights, "none", "123"), x)
    if "d" in which:
        bench("d stage2 only (9mm, no act)",
              lambda x_: run_variant(x, weights, "none", "2"), x)
    if "e" in which:
        bench("e stages 1+3 only (no act)",
              lambda x_: run_variant(x, weights, "none", "13"), x)
    if "f" in which:
        bench("f single 192x192 matmul", lambda x_: run_matmul(x, wmm), x)
    if "g" in which:
        bench("g one-call halo-replicated (gelu)",
              lambda x_: run_g(x, weights), x)


if __name__ == "__main__":
    main()
