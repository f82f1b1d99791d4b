"""Per-layer g_s breakdown on the real TPU (decode model floor hunt).

profile_decode_floor.py pinned synthesize(g_s) at ~4.5 ms/img, 9.7% MFU
— the single largest piece of the decode floor. This times each g_s
stage in isolation (same K2-K1 fori_loop differencing) to find where
the MXU idles. Layers (WACNN g_s, wacnn.py:88-98):

  0 attn(M=320) @48x32   1 deconv 320->192 ->96x64   2 iGDN
  3 deconv 192->192 ->192x128   4 iGDN   5 attn(192,ws8) @192x128
  6 deconv 192->192 ->384x256   7 iGDN   8 deconv 192->3 ->768x512

Run: PYTHONPATH=/root/.axon_site:. python tools/profile_gs_layers.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from resdsic_tpu.models import WACNN

B, H, W = 16, 768, 512
DT = jnp.bfloat16
K1, K2 = 4, 16
REPS = 3
V5E_PEAK = 197e12


def _looped(fn, k):
    def looped(x):
        def body(i, carry):
            x_in, acc = carry
            out = fn(x_in)
            s = jnp.sum(out.astype(jnp.float32))
            x_next = (x_in + (1e-12 * s).astype(x_in.dtype))
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


def bench(name, fn, x, flops=0.0):
    t1 = _time(_looped(fn, K1), x)
    t2 = _time(_looped(fn, K2), x)
    dt = max((t2 - t1) / (K2 - K1), 1e-9)
    mfu = flops / dt / V5E_PEAK if flops else 0.0
    print(
        f"{name:44s} {dt*1e3:8.2f} ms/batch {dt/B*1e3:7.3f} ms/img"
        + (f"  MFU {mfu*100:5.1f}%" if flops else ""),
        flush=True,
    )
    return dt


def main():
    model = WACNN(dtype=DT)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )

    hy, wy = H // 16, W // 16  # 48x32
    M, N = model.M, model.N
    key = jax.random.key(1)

    # g_s stage shapes (input to each layer)
    shapes = [
        (B, hy, wy, M),          # 0 attn M
        (B, hy, wy, M),          # 1 deconv M->N
        (B, hy * 2, wy * 2, N),  # 2 iGDN
        (B, hy * 2, wy * 2, N),  # 3 deconv N->N
        (B, hy * 4, wy * 4, N),  # 4 iGDN
        (B, hy * 4, wy * 4, N),  # 5 attn N ws8
        (B, hy * 4, wy * 4, N),  # 6 deconv N->N
        (B, hy * 8, wy * 8, N),  # 7 iGDN
        (B, hy * 8, wy * 8, N),  # 8 deconv N->3
    ]
    pos = [s[1] * s[2] for s in shapes]
    taps = 25.0 / 4.0  # avg taps per output position, k5 s2 phase-packed
    fl = [
        2 * B * pos[0] * M * M * 4 + 2 * B * pos[0] * 16 * M * 2,
        2 * B * pos[0] * 4 * M * N * taps,
        2 * B * pos[2] * N * N,
        2 * B * pos[3] * 4 * N * N * taps,
        2 * B * pos[4] * N * N,
        2 * B * pos[5] * N * N * 4 + 2 * B * pos[5] * 64 * N * 2,
        2 * B * pos[6] * 4 * N * N * taps,
        2 * B * pos[7] * N * N,
        2 * B * pos[8] * 4 * N * 3 * taps,
    ]
    names = [
        "0 attn(M) @48x32",
        "1 deconv M->N ->96x64",
        "2 iGDN @96x64",
        "3 deconv N->N ->192x128",
        "4 iGDN @192x128",
        "5 attn(N,ws8) @192x128",
        "6 deconv N->N ->384x256",
        "7 iGDN @384x256",
        "8 deconv N->3 ->768x512",
    ]

    def layer_fn(i):
        def fn(x):
            def apply_layer(mdl, xx):
                return mdl.g_s[i](xx)

            return model.apply(params, x, method=apply_layer)

        return fn

    total = 0.0
    for i in range(9):
        x = jax.random.normal(key, shapes[i], DT)
        total += bench(names[i], layer_fn(i), x, fl[i])
    print(f"{'sum of layers':44s} {total*1e3:8.2f} ms/batch {total/B*1e3:7.3f} ms/img")


if __name__ == "__main__":
    main()
