"""Decompose WinNoShiftAttention @192x128 C192 (g_s layer 5 / g_a layer 4)
— the single largest model-floor item (28.9 ms/batch measured).

Times: one ResidualUnit (fused kernel vs unfused), WinBasedAttention
(shifted, masked), the final 1x1, and the whole block.

Run: PYTHONPATH=/root/.axon_site:. python tools/profile_attn_block.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flax import linen as nn

from resdsic_tpu.nn.attention import (
    ResidualUnit,
    WinBasedAttention,
    WinNoShiftAttention,
)

B, H, W, C = 16, 192, 128, 192
DT = jnp.bfloat16
K1, K2 = 4, 16
REPS = 3


def _looped(fn, k):
    def looped(x):
        def body(i, carry):
            x_in, acc = carry
            out = fn(x_in)
            s = jnp.sum(out.astype(jnp.float32))
            x_next = x_in + (1e-12 * s).astype(x_in.dtype)
            return (x_next, acc + s)

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


def make(mod):
    params = jax.jit(mod.init)(jax.random.key(0), jnp.zeros((1, 16, 16, C), DT))
    return lambda x: mod.apply(params, x)


def main():
    print(f"# backend={jax.default_backend()}")
    x = jax.random.normal(jax.random.key(1), (B, H, W, C), DT)

    bench("ResidualUnit (fused auto)", make(ResidualUnit(C, dtype=DT)), x)
    bench("ResidualUnit (unfused)",
          make(ResidualUnit(C, dtype=DT, use_pallas=False)), x)
    bench("WinBasedAttention ws8 shift4",
          make(WinBasedAttention(C, 8, 8, 4, dtype=DT)), x)
    bench("WinNoShiftAttention full block",
          make(WinNoShiftAttention(C, 8, 8, 4, dtype=DT)), x)


if __name__ == "__main__":
    main()
