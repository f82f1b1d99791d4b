"""Final deconv (N=192 -> 3, k=5 s=2, 384x256 -> 768x512) variants.

The phase-decomposed dense conv (Deconv._subpixel) runs at 3.1% MFU
(7.3 ms/batch-16): its matmul has N=12 output channels, so ~90% of each
128-wide MXU tile is idle. Variants fold output columns into channels to
fatten N:

  v0  current: dense conv (U,U,192,12) + pixel_shuffle(2)
  v1  fold 8 output-x positions: banded kernel (U, U+7, 192, 96),
      window stride (1,8), then unfold -> identical output
  v2  fold 4:  (U, U+3, 192, 48), stride (1,4)
  v3  fold 16: (U, U+15, 192, 192), stride (1,16)

Run: PYTHONPATH=/root/.axon_site:. python tools/exp_deconv3.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flax import linen as nn

from resdsic_tpu.nn.conv import Deconv, pixel_shuffle

B, H, W = 16, 384, 256
CIN, COUT, KS, S = 192, 3, 5, 2
DT = jnp.bfloat16
K1, K2 = 4, 16
REPS = 3


def packed_kernel(kernel):
    """Replicate Deconv._subpixel's phase packing: (U,U,CIN,COUT*s*s)."""
    k, s, f = KS, S, COUT
    pad_lo = k - 1 - k // 2
    m0 = [(pad_lo - r) % s for r in range(s)]
    n_taps = [-(-(k - m0[r]) // s) for r in range(s)]
    e = [(r + m0[r] - pad_lo) // s for r in range(s)]
    E = min(e)
    U = max(n_taps[r] + e[r] - E for r in range(s))
    packed = jnp.zeros((U, U, CIN, f * s * s), kernel.dtype)
    for ra in range(s):
        for rb in range(s):
            sub = kernel[m0[ra]::s, m0[rb]::s]
            ua, ub = e[ra] - E, e[rb] - E
            packed = packed.at[
                ua:ua + sub.shape[0], ub:ub + sub.shape[1], :,
                (ra * s + rb)::s * s,
            ].set(sub)
    return packed, U, E


def fold_kernel(packed, U, fold):
    """Band the packed kernel so `fold` adjacent output-x positions come
    out as channels: W'[a, b, :, j*C12 + o] = packed[a, b - j, :, o]."""
    c12 = packed.shape[-1]
    wide = jnp.zeros((U, U + fold - 1, CIN, c12 * fold), packed.dtype)
    for j in range(fold):
        wide = wide.at[:, j:j + U, :, j * c12:(j + 1) * c12].set(packed)
    return wide


def run_folded(x, packed, U, E, fold):
    wide = fold_kernel(packed, U, fold)
    c12 = packed.shape[-1]
    # same padding as the dense conv; width must cover stride-fold windows
    y = jax.lax.conv_general_dilated(
        x.astype(DT), wide.astype(DT),
        window_strides=(1, fold),
        padding=((-E, U - 1 + E), (-E, U - 1 + E + fold - 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W/fold, c12*fold)
    b, h, wf, _ = y.shape
    y = y.reshape(b, h, wf * fold, c12)
    return pixel_shuffle(y, S)


def run_dense(x, packed, U, E):
    y = jax.lax.conv_general_dilated(
        x.astype(DT), packed.astype(DT),
        window_strides=(1, 1),
        padding=((-E, U - 1 + E), (-E, U - 1 + E)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return pixel_shuffle(y, S)


def _looped(fn, k):
    def looped(x):
        def body(i, carry):
            x_in, acc = carry
            out = fn(x_in)
            s = jnp.sum(out[:, :8].astype(jnp.float32))
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
    print(f"{name:40s} {dt*1e3:8.2f} ms/batch {dt/B*1e3:7.3f} ms/img",
          flush=True)
    return dt


def main():
    print(f"# backend={jax.default_backend()}")
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (B, H, W, CIN), DT)
    kernel = jax.random.normal(ks[1], (KS, KS, CIN, COUT), jnp.float32) * 0.05
    packed, U, E = packed_kernel(kernel)
    print(f"# packed U={U} E={E}")

    ref = run_dense(x, packed, U, E)
    for fold in (4, 8, 16):
        got = run_folded(x, packed, U, E, fold)
        err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        print(f"  fold={fold} max|err| = {float(err):.3e}")

    bench("v0 dense + shuffle", lambda x_: run_dense(x_, packed, U, E), x)
    bench("v2 fold 4", lambda x_: run_folded(x_, packed, U, E, 4), x)
    bench("v1 fold 8", lambda x_: run_folded(x_, packed, U, E, 8), x)
    bench("v3 fold 16", lambda x_: run_folded(x_, packed, U, E, 16), x)


if __name__ == "__main__":
    main()
