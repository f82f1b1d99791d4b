"""A/B: fused Pallas window attention vs the XLA einsum chain, on real TPU.

Run: PYTHONPATH=/root/.axon_site:. python tools/ab_win_attention.py

Uses the fori_loop-differencing discipline from profile_stages.py (the axon
tunnel's ~25-30ms dispatch round trip must be cancelled by timing two loop
lengths and differencing).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from resdsic_tpu.ops.pallas_win_attention import fused_window_attention

K1, K2 = 4, 24
REPS = 3


def xla_attention(xw, wqkv, bqkv, wproj, bproj, rel_bias, mask, nh, cdt):
    b_, n, c = xw.shape
    hd = c // nh
    scale = hd ** -0.5
    qkv = (xw.astype(cdt) @ wqkv.astype(cdt) + bqkv).astype(cdt)
    qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + rel_bias[None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b_ // nw, nw, nh, n, n) + mask[None, :, None]
        attn = attn.reshape(b_, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(cdt)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=cdt)
    out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
    return (out.astype(cdt) @ wproj.astype(cdt) + bproj).astype(xw.dtype)


def timed(fn, *args):
    def looped(k, *a):
        def body(i, carry):
            x, acc = carry
            out = fn(x, *a[1:])
            s = jnp.sum(out.astype(jnp.float32))
            x = x * (1.0 + 1e-12 * s).astype(x.dtype)
            return (x, acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (a[0], jnp.float32(0)))
        return acc

    f1 = jax.jit(lambda *a: looped(K1, *a))
    f2 = jax.jit(lambda *a: looped(K2, *a))
    float(f1(*args)); float(f2(*args))
    t1 = t2 = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter(); float(f1(*args)); t1 += time.perf_counter() - t0
        t0 = time.perf_counter(); float(f2(*args)); t2 += time.perf_counter() - t0
    return ((t2 - t1) / REPS) / (K2 - K1)


def run_case(name, B, H, W, C, ws, shift, nh, dtype):
    from resdsic_tpu.nn.attention import (
        _relative_position_index,
        make_shift_attn_mask,
        window_partition,
    )

    rng = np.random.default_rng(0)
    n = ws * ws
    nw = (H // ws) * (W // ws)
    hd = C // nh
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dtype)
    wqkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, dtype)
    bqkv = jnp.asarray(rng.standard_normal(3 * C) * 0.01, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((C, C)) * 0.05, dtype)
    bproj = jnp.asarray(rng.standard_normal(C) * 0.01, jnp.float32)
    table = jnp.asarray(
        rng.standard_normal(((2 * ws - 1) ** 2, nh)) * 0.02, jnp.float32
    )
    rel_bias = table[_relative_position_index(ws, ws).reshape(-1)].reshape(
        n, n, nh
    ).transpose(2, 0, 1)
    mask = (
        jnp.asarray(make_shift_attn_mask(H, W, ws, shift)) if shift else None
    )

    if shift:
        xs = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    else:
        xs = x
    xw = window_partition(xs, ws)

    def f_xla(xw_):
        return xla_attention(
            xw_, wqkv, bqkv, wproj, bproj, rel_bias, mask, nh, dtype
        )

    def f_pal(xw_):
        return fused_window_attention(
            xw_, wqkv, bqkv, wproj, bproj, rel_bias, mask,
            num_heads=nh, num_win_per_image=nw,
        )

    a = jax.jit(f_xla)(xw)
    b = jax.jit(f_pal)(xw)
    diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(a.astype(jnp.float32))))

    t_xla = timed(f_xla, xw)
    t_pal = timed(f_pal, xw)
    print(
        f"{name}: xla {t_xla*1e3:.2f}ms  pallas {t_pal*1e3:.2f}ms  "
        f"speedup {t_xla/t_pal:.2f}x  maxdiff {diff:.2e} (ref max {ref:.1f})"
    )


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    # WACNN g_a/g_s attention stages at Kodak 768x512, batch 16
    run_case("win8 C192 bf16", 16, 192, 128, 192, 8, 4, 8, jnp.bfloat16)
    run_case("win4 C320 bf16", 16, 48, 32, 320, 4, 2, 8, jnp.bfloat16)
    run_case("win8 C192 f32 ", 16, 192, 128, 192, 8, 4, 8, jnp.float32)
