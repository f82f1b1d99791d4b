"""Per-stage device timing for the WACNN compute path on the real TPU.

Axon-tunnel measurement rules (hard-won):
  * jax block_until_ready does NOT synchronize on this backend — only a
    host fetch of real data does (float(scalar)).
  * every dispatch+fetch pays a ~25-30 ms round trip, so each op runs K
    times inside ONE jitted fori_loop with a data dependence; timing two K
    values and differencing cancels the fixed round-trip cost exactly:
        per_iter = (t(K2) - t(K1)) / (K2 - K1)

Run from repo root:
    PYTHONPATH=/root/.axon_site:. python tools/profile_stages.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from resdsic_tpu.nn import GDN, Conv, Deconv, SubpelConv3x3, WinNoShiftAttention

B = 16
DT = jnp.bfloat16
K1, K2 = 4, 24
REPS = 3
V5E_PEAK = 197e12


def _looped_fn(module, k):
    def looped(p, x):
        def body(i, carry):
            x_in, acc = carry
            out = module.apply(p, x_in)
            # full-output reduction: a partial slice lets XLA narrow the op
            # to the sliced rows and fabricate impossible timings
            s = jnp.sum(out.astype(jnp.float32))
            x_next = x_in * (1.0 + 1e-12 * s).astype(x_in.dtype)
            return (x_next, acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    return jax.jit(looped)


def _time_fetch(fn, params, x):
    float(fn(params, x))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(params, x))
    return (time.perf_counter() - t0) / REPS


def bench_one(name, module, shape):
    x0 = jax.random.normal(jax.random.key(0), shape, DT) * 0.1
    params = module.init({"params": jax.random.key(0)}, x0)

    t1 = _time_fetch(_looped_fn(module, K1), params, x0)
    t2 = _time_fetch(_looped_fn(module, K2), params, x0)
    dt = max((t2 - t1) / (K2 - K1), 1e-9)

    try:
        one = jax.jit(lambda p, x: module.apply(p, x))
        ca = one.lower(params, x0).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bytes_ = float(ca.get("bytes accessed", 0.0))
    except Exception:
        flops, bytes_ = 0.0, 0.0
    mfu = flops / dt / V5E_PEAK
    bw = bytes_ / dt / 1e9
    print(
        f"{name:44s} {dt*1e3:9.3f} ms  {flops/1e9:9.1f} GF  "
        f"MFU {mfu*100:5.1f}%  {bw:7.0f} GB/s",
        flush=True,
    )
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    total = 0.0

    # ---- g_a chain at bench shapes (768x512 input, batch 16) ----
    total += bench_one("conv5x5 s2 3->192 @768x512", Conv(192, kernel_size=5, stride=2, dtype=DT), (B, 768, 512, 3))
    total += bench_one("gdn @384x256x192", GDN(dtype=DT), (B, 384, 256, 192))
    total += bench_one("conv5x5 s2 192->192 @384x256", Conv(192, kernel_size=5, stride=2, dtype=DT), (B, 384, 256, 192))
    total += bench_one("gdn @192x128x192", GDN(dtype=DT), (B, 192, 128, 192))
    total += bench_one("attn w8 s4 @192x128x192", WinNoShiftAttention(dim=192, num_heads=8, window_size=8, shift_size=4, dtype=DT), (B, 192, 128, 192))
    total += bench_one("conv5x5 s2 192->192 @192x128", Conv(192, kernel_size=5, stride=2, dtype=DT), (B, 192, 128, 192))
    total += bench_one("gdn @96x64x192", GDN(dtype=DT), (B, 96, 64, 192))
    total += bench_one("conv5x5 s2 192->320 @96x64", Conv(320, kernel_size=5, stride=2, dtype=DT), (B, 96, 64, 192))
    total += bench_one("attn w4 s2 @48x32x320", WinNoShiftAttention(dim=320, num_heads=8, window_size=4, shift_size=2, dtype=DT), (B, 48, 32, 320))
    print(f"{'-- g_a sum':44s} {total*1e3:9.3f} ms", flush=True)

    # ---- g_s distinctive pieces ----
    bench_one("deconv5x5 s2 320->192 @48x32", Deconv(192, kernel_size=5, stride=2, dtype=DT), (B, 48, 32, 320))
    bench_one("deconv5x5 s2 192->192 @192x128", Deconv(192, kernel_size=5, stride=2, dtype=DT), (B, 192, 128, 192))
    bench_one("deconv5x5 s2 192->3 @384x256", Deconv(3, kernel_size=5, stride=2, dtype=DT), (B, 384, 256, 192))

    # ---- hyper + cc-transform shapes ----
    bench_one("conv3x3 320->320 @48x32 (h_a0)", Conv(320, kernel_size=3, stride=1, dtype=DT), (B, 48, 32, 320))
    bench_one("cc conv3x3 480->224 @48x32", Conv(224, kernel_size=3, stride=1, dtype=DT), (B, 48, 32, 480))
    bench_one("cc conv3x3 224->176 @48x32", Conv(176, kernel_size=3, stride=1, dtype=DT), (B, 48, 32, 224))
    bench_one("cc conv3x3 128->64 @48x32", Conv(64, kernel_size=3, stride=1, dtype=DT), (B, 48, 32, 128))
    bench_one("subpel3x3 r2 192->224 @12x8", SubpelConv3x3(224, r=2, dtype=DT), (B, 12, 8, 192))


if __name__ == "__main__":
    main()
