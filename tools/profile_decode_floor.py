"""Decode model-floor breakdown on the real TPU (ROADMAP r4 item 2).

PROFILE_r3.md pins the coded decode program at 13.3 ms/img with a 9.6
ms/img "model floor" (g_s + hyper + slice nets + value placement). The
floor is ~10x off the chip's bf16 roofline (~210 GF/img of convs ≈ 1.1
ms at peak), so the next perf round needs to know WHICH piece wastes the
MXU. Times each decode-side submodule in isolation with the K2-K1
fori_loop differencing harness (profile_stages.py measurement rules:
fetch-synced, full-output reductions, round-trip cancelled).

Run: PYTHONPATH=/root/.axon_site:. python tools/profile_decode_floor.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from resdsic_tpu.models import WACNN

B, H, W = 16, 768, 512
DT = jnp.bfloat16
K1, K2 = 4, 16
REPS = 3
V5E_PEAK = 197e12


def _tree_sum(t):
    return sum(
        jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(t)
    )


def _looped(fn, k):
    """fn(x) -> pytree; x is perturbed through each iteration so the loop
    body cannot be hoisted/narrowed."""

    def looped(x):
        def body(i, carry):
            x_in, acc = carry
            s = _tree_sum(fn(x_in))
            x_next = x_in * (1.0 + 1e-12 * s).astype(x_in.dtype)
            return (x_next, acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    return jax.jit(looped)


def _time(fn, x):
    float(fn(x))  # compile + warm
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
        f"{name:40s} {dt*1e3:8.2f} ms/batch {dt/B*1e3:7.3f} ms/img"
        + (f"  MFU {mfu*100:5.1f}%" if flops else ""),
        flush=True,
    )
    return dt


def conv_flops(pos, cin, cout, k=3):
    return 2.0 * B * pos * cin * cout * k * k


def main():
    model = WACNN(dtype=DT)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    try:
        from resdsic_tpu.utils.checkpoint import load_params_npz

        params = load_params_npz("artifacts_q65/cnn_trained_bf16.npz", params)
        print("# trained λ=0.013 params")
    except Exception:
        print("# random init params")

    hy, wy = H // 16, W // 16          # y: 48x32
    hz, wz = hy // 4, wy // 4          # z: 12x8
    M, N, S = model.M, model.N, model.slice_ch
    key = jax.random.key(1)
    z_hat = jax.random.normal(key, (B, hz, wz, N), DT)
    lm = jax.random.normal(key, (B, hy, wy, M), DT)
    ls = jax.random.normal(key, (B, hy, wy, M), DT) * 0.5
    sup = tuple(
        jax.random.normal(jax.random.key(i), (B, hy, wy, S), jnp.float32)
        for i in range(5)
    )
    y_hat = jax.random.normal(key, (B, hy, wy, M), jnp.float32)
    sym = jnp.round(
        jax.random.normal(key, (B, hy, wy, S), jnp.float32) * 2
    )

    ap = model.apply
    pos_y = hy * wy

    # hyper synthesis: h_mean_s + h_scale_s, ~10 convs/subpels at z->y
    hw = [M, 288, 256, 224, N]
    fl_h = 2 * sum(
        conv_flops(hz * wz, hw[4], hw[4])
        + conv_flops(hz * wz, hw[4], hw[3] * 4)
        + conv_flops(hz * wz * 4, hw[3], hw[2])
        + conv_flops(hz * wz * 4, hw[2], hw[1] * 4)
        + conv_flops(pos_y, hw[1], hw[0])
        for _ in (0,)
    )
    bench("hyper_synthesis (means+scales)",
          lambda z: ap(params, z, method="hyper_synthesis"), z_hat, fl_h)

    # one slice's (mu, scale, indexes) at max support (5 slices)
    cw = [224, 176, 128, 64]
    cin5 = M + 5 * S
    fl_cc = (
        conv_flops(pos_y, cin5, cw[0]) + conv_flops(pos_y, cw[0], cw[1])
        + conv_flops(pos_y, cw[1], cw[2]) + conv_flops(pos_y, cw[2], cw[3])
        + conv_flops(pos_y, cw[3], S)
    )
    bench("slice_params idx5 (mu+scale+idx)",
          lambda l: ap(params, 5, l, ls, sup, method="slice_params"),
          lm, 2 * fl_cc)
    bench("slice_params idx0 (no support)",
          lambda l: ap(params, 0, l, ls, (), method="slice_params"),
          lm, 2 * (fl_cc * (M / cin5)))

    # one slice's reconstruction (LRP stack)
    fl_lrp = (
        conv_flops(pos_y, cin5 + S, cw[0]) + conv_flops(pos_y, cw[0], cw[1])
        + conv_flops(pos_y, cw[1], cw[2]) + conv_flops(pos_y, cw[2], cw[3])
        + conv_flops(pos_y, cw[3], S)
    )
    bench("slice_reconstruct idx5 (LRP)",
          lambda s: ap(params, 5, s, sym, lm, sup,
                       method="slice_reconstruct"),
          sym, fl_lrp)

    # g_s: attention + 4 deconvs + 3 iGDN
    fl_gs = (
        2 * B * (pos_y * M * M * 8 + pos_y * 4 * 4 * M * 2)      # win attn M
        + conv_flops(pos_y, M, N, 5)                              # deconv1
        + conv_flops(pos_y * 4, N, N, 5)                          # deconv2
        + 2 * B * (pos_y * 16 * N * N * 8)                        # win attn N
        + conv_flops(pos_y * 16, N, N, 5)                         # deconv3
        + conv_flops(pos_y * 64, N, 3, 5)                         # deconv4
        + 2 * 3 * B * pos_y * 16 * N * N                          # iGDNs ~
    )
    bench("synthesize (g_s)",
          lambda y: ap(params, y, method="synthesize"), y_hat, fl_gs)

    # full 10-slice param+reconstruct chain (decode_begin/step/end shape,
    # without the coder): what the decode program's model floor should be
    def chain(l):
        slices = []
        mu, scale, _ = ap(params, 0, l, ls, (), method="slice_params")
        for i in range(model.num_slices):
            rec = ap(params, i, sym, mu, l, tuple(slices[:5]),
                     method="slice_reconstruct")
            slices.append(rec)
            if i + 1 < model.num_slices:
                mu, scale, _ = ap(params, i + 1, l, ls, tuple(slices[:5]),
                                  method="slice_params")
        yh = jnp.concatenate(slices, axis=-1)
        return ap(params, yh.astype(jnp.float32), method="synthesize")

    bench("full chain (params+rec x10 + g_s)", chain, lm)


if __name__ == "__main__":
    main()
