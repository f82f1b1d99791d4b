"""Decompose the WinNoShiftAttention cost at the g_s hot shape and A/B
the Pallas fused kernel vs the XLA einsum path (VERDICT r5 #5).

profile_gs_layers.py pins `attn(N,ws8) @192x128` at 1.80 ms/img (B=16,
bf16) — the largest single item of the decode model floor, and the same
block sits in g_a. This times: the full block, the 6-ResidualUnit
chain alone, the WinBasedAttention alone, each under Pallas on/off.

Run: PYTHONPATH=/root/.axon_site:. python tools/exp_attn_speed.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flax import linen as nn

B = 16
DT = jnp.bfloat16
K1, K2 = 4, 16
REPS = 3


def _looped(fn, k):
    def looped(p, x):
        def body(i, carry):
            x_in, acc = carry
            s = jnp.sum(fn(p, x_in).astype(jnp.float32))
            return (x_in * (1.0 + 1e-12 * s).astype(x_in.dtype), acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    return jax.jit(looped)


def timeit(name, module, shape):
    x = jax.random.normal(jax.random.key(0), shape, DT) * 0.1
    p = module.init({"params": jax.random.key(1)}, x)
    f1, f2 = _looped(module.apply, K1), _looped(module.apply, K2)
    float(f1(p, x)); float(f2(p, x))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(f1(p, x))
    t1 = (time.perf_counter() - t0) / REPS
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(f2(p, x))
    t2 = (time.perf_counter() - t0) / REPS
    dt = max((t2 - t1) / (K2 - K1), 1e-9)
    print(f"{name:48s} {dt*1e3:8.2f} ms/batch {dt/B*1e3:7.3f} ms/img",
          flush=True)
    return dt


class RUChain(nn.Module):
    n: int = 3

    @nn.compact
    def __call__(self, x):
        from resdsic_tpu.nn.attention import ResidualUnit

        for i in range(self.n):
            x = ResidualUnit(192, dtype=DT, name=f"ru{i}")(x)
        return x


def main():
    print(f"devices: {jax.devices()}  default_backend={jax.default_backend()}",
          flush=True)
    from resdsic_tpu.nn.attention import (
        WinBasedAttention,
        WinNoShiftAttention,
    )
    from resdsic_tpu.ops.pallas_win_attention import pallas_attention_enabled

    shape = (B, 192, 128, 192)
    print(f"pallas_attention_enabled: {pallas_attention_enabled()}",
          flush=True)
    timeit("RU chain x3 (one branch)", RUChain(), shape)
    for env in ("0", "1"):
        os.environ["RESDSIC_PALLAS_ATTN"] = env
        tag = "XLA" if env == "0" else "PALLAS"
        timeit(f"[{tag}] WinBasedAttention ws8 s4",
               WinBasedAttention(dim=192, num_heads=8, window_size=8,
                                 shift_size=4, dtype=DT), shape)
        timeit(f"[{tag}] WinNoShiftAttention full",
               WinNoShiftAttention(dim=192, num_heads=8, window_size=8,
                                   shift_size=4, dtype=DT), shape)


if __name__ == "__main__":
    main()
