"""ResidualUnit kernel variant shootout @ (16,192,128,192) bf16.

The fused kernel (ops/pallas_resunit.py) measured ~parity with the
unfused chain (3.6 vs 3.5 ms/batch) while the arithmetic floor is
~0.5 ms — hypothesis: the C/2=96-lane matmuls are misaligned to the
128-wide MXU and the 9 tiny-K matmuls underfeed it. Variants:

  v0  fused as committed (c2=96, 9 matmuls K=96)
  v1  c2 zero-padded to 128 (9 matmuls K=N=128, exact MXU tiles);
      zeros propagate exactly: gelu(0)=0, zero w3 rows contribute 0
  v2  v1 + dy stacked into K (3 matmuls K=384)
  xla unfused XLA formulation (no det kernels)

Run: PYTHONPATH=/root/.axon_site:. python tools/exp_resunit.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from resdsic_tpu.ops.pallas_resunit import (
    _resunit_xla,
    fused_residual_unit,
)

B, H, W, C = 16, 192, 128, 192
DT = jnp.bfloat16
K1, K2 = 4, 16
REPS = 3
_VMEM_BUDGET = 12 * 1024 * 1024


def _gelu(x):
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


# ---------------- v1: lane-padded c2, 9 matmuls ----------------

def _kernel_v1(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
               *, th, w, c, c2p, lo, hi, compute_dtype, stack_dy):
    xt = x_ref[0].astype(compute_dtype)  # (TH+2, W, C)

    t = jnp.dot(
        xt.reshape((th + 2) * w, c),
        w1_ref[...].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    t = _gelu(t.astype(compute_dtype)).reshape(th + 2, w, c2p)

    if lo > 0 or hi < th + 2:
        rows = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
        t = jnp.where((rows >= lo) & (rows < hi), t, jnp.zeros_like(t))

    zcol = jnp.zeros((th + 2, 1, c2p), t.dtype)
    tp = jnp.concatenate([zcol, t, zcol], axis=1)  # (TH+2, W+2, C2P)

    if stack_dy:
        # rows stacked into K: (TH, W+2, 3*C2P), one matmul per dx
        ts = jnp.concatenate(
            [tp[dy : dy + th] for dy in range(3)], axis=-1
        )
        acc = None
        for dx in range(3):
            patch = ts[:, dx : dx + w, :].reshape(th * w, 3 * c2p)
            z = jnp.dot(
                patch,
                w2_ref[dx].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            acc = z if acc is None else acc + z
    else:
        acc = None
        for dy in range(3):
            for dx in range(3):
                patch = tp[dy : dy + th, dx : dx + w, :].reshape(th * w, c2p)
                z = jnp.dot(
                    patch,
                    w2_ref[dy, dx].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                acc = z if acc is None else acc + z
    t2 = _gelu((acc + b2_ref[...].astype(jnp.float32)).astype(compute_dtype))

    out = jnp.dot(
        t2,
        w3_ref[...].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + b3_ref[...].astype(jnp.float32)
    xc = xt[1 : th + 1].reshape(th * w, c)
    o = _gelu(out.astype(compute_dtype) + xc)
    o_ref[0] = o.reshape(th, w, c).astype(o_ref.dtype)


def _tiles(h, w, c, c2p, itemsize, stack_dy):
    weights = (c * c2p + 9 * c2p * c2p + c2p * c) * 4

    def est(th):
        x_tile = 2 * (th + 2) * w * c * itemsize
        t = (th + 2) * w * c2p * (4 + itemsize)
        patch = (4 if not stack_dy else 8) * th * w * c2p * itemsize
        acc2 = th * w * c2p * 4
        out = th * w * c * 4 + 2 * th * w * c * itemsize
        return weights + x_tile + t + patch + acc2 + out

    th = h
    while th > 8 and est(th) > _VMEM_BUDGET:
        th = (th + 1) // 2
    tiles = []
    r = h
    while r > 0:
        tiles.append(min(th, r))
        r -= tiles[-1]
    return tiles


def resunit_v1(x, w1, b1, w2, b2, w3, b3, *, compute_dtype, stack_dy=False):
    b, h, w, c = x.shape
    c2 = w1.shape[-1]
    c2p = 128 if c2 <= 128 else ((c2 + 127) // 128) * 128
    # zero-pad the bottleneck channel to the MXU lane width
    w1p = jnp.pad(w1, ((0, 0), (0, c2p - c2)))
    b1p = jnp.pad(b1, (0, c2p - c2)).reshape(1, -1)
    w2p = jnp.pad(w2, ((0, 0), (0, 0), (0, c2p - c2), (0, c2p - c2)))
    b2p = jnp.pad(b2, (0, c2p - c2)).reshape(1, -1)
    w3p = jnp.pad(w3, ((0, c2p - c2), (0, 0)))
    b3p = b3.reshape(1, -1)
    if stack_dy:
        w2p = w2p.transpose(1, 0, 2, 3).reshape(3, 3 * c2p, c2p)
        w2_spec = pl.BlockSpec((3, 3 * c2p, c2p), lambda i: (0, 0, 0))
    else:
        w2_spec = pl.BlockSpec((3, 3, c2p, c2p), lambda i: (0, 0, 0, 0))

    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))

    def call(x_tile, th, lo, hi):
        return pl.pallas_call(
            functools.partial(
                _kernel_v1, th=th, w=w, c=c, c2p=c2p, lo=lo, hi=hi,
                compute_dtype=compute_dtype, stack_dy=stack_dy,
            ),
            out_shape=jax.ShapeDtypeStruct((b, th, w, c), compute_dtype),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, th + 2, w, c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((c, c2p), lambda i: (0, 0)),
                pl.BlockSpec((1, c2p), lambda i: (0, 0)),
                w2_spec,
                pl.BlockSpec((1, c2p), lambda i: (0, 0)),
                pl.BlockSpec((c2p, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, w, c), lambda i: (i, 0, 0, 0)),
        )(x_tile, w1p, b1p, w2p, b2p, w3p, b3p)

    outs = []
    r0 = 0
    for th in _tiles(h, w, c, c2p, x.dtype.itemsize, stack_dy):
        lo = max(0, 1 - r0)
        hi = min(th + 2, h + 1 - r0)
        outs.append(
            call(jax.lax.slice_in_dim(xp, r0, r0 + th + 2, axis=1), th, lo, hi)
        )
        r0 += th
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


# ---------------- timing harness ----------------

def _looped(fn, k):
    def looped(x):
        def body(i, carry):
            x_in, acc = carry
            out = fn(x_in)
            s = jnp.sum(out.astype(jnp.float32))
            return (x_in + (1e-12 * s).astype(x_in.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    return jax.jit(looped)


def _time(fn, x):
    float(fn(x))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(x))
    return (time.perf_counter() - t0) / REPS


def bench(name, fn, x, flops):
    t1 = _time(_looped(fn, K1), x)
    t2 = _time(_looped(fn, K2), x)
    dt = max((t2 - t1) / (K2 - K1), 1e-9)
    mfu = flops / dt / 197e12 * 100
    print(f"{name:36s} {dt*1e3:8.2f} ms/batch {dt/B*1e3:7.3f} ms/img "
          f"MFU {mfu:5.1f}%", flush=True)
    return dt


def main():
    print(f"# backend={jax.default_backend()}")
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    c2 = C // 2
    x = jax.random.normal(ks[0], (B, H, W, C), DT)
    w1 = jax.random.normal(ks[1], (C, c2), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (c2,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (3, 3, c2, c2), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (c2,), jnp.float32) * 0.1
    w3 = jax.random.normal(ks[5], (c2, C), jnp.float32) * 0.05
    b3 = jax.random.normal(ks[6], (C,), jnp.float32) * 0.1

    flops = 2 * B * H * W * (C * c2 * 2 + 9 * c2 * c2)

    ref = _resunit_xla(x, w1, b1, w2, b2, w3, b3, compute_dtype=DT)

    def check(name, fn):
        got = fn(x)
        err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        print(f"  {name} max|err| vs xla = {float(err):.3e}")

    v0 = lambda x_: fused_residual_unit(x_, w1, b1, w2, b2, w3, b3, DT)
    v1 = lambda x_: resunit_v1(x_, w1, b1, w2, b2, w3, b3, compute_dtype=DT)
    v2 = lambda x_: resunit_v1(x_, w1, b1, w2, b2, w3, b3, compute_dtype=DT,
                               stack_dy=True)
    xla = lambda x_: _resunit_xla(x_, w1, b1, w2, b2, w3, b3, compute_dtype=DT)

    check("v1", v1)
    check("v2", v2)

    bench("xla unfused", xla, x, flops)
    bench("v0 fused c2=96", v0, x, flops)
    bench("v1 fused c2pad=128", v1, x, flops)
    bench("v2 fused c2pad + dy-stack K=384", v2, x, flops)


if __name__ == "__main__":
    main()
