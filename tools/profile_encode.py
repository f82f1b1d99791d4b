"""Fetch-synced timing of the fused codec programs on the real TPU.

bench.py's device-only number uses block_until_ready, which does NOT
synchronize on the axon backend — this harness times each program by
K-loop differencing with a scalar fetch (the only reliable sync), so the
number is pure device execution with the tunnel round-trip cancelled.

Run: PYTHONPATH=/root/.axon_site:. python tools/profile_encode.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from resdsic_tpu.models import WACNN

B = 16
H, W = 768, 512
DT = jnp.bfloat16
K1, K2 = 2, 8
REPS = 3
V5E_PEAK = 197e12


def _time_fetch(fn, *args):
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(*args))
    return (time.perf_counter() - t0) / REPS


def k_loop(apply_fn, out_to_scalar, perturb):
    """Build jitted fns running apply_fn K times with a data dependence."""

    def make(k):
        def looped(params, x):
            def body(i, carry):
                x_in, acc = carry
                out = apply_fn(params, x_in)
                s = out_to_scalar(out)
                return (perturb(x_in, s), acc + s)

            _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
            return acc

        return jax.jit(looped)

    return make


def bench(name, apply_fn, params, x, out_to_scalar, flops=0.0):
    def perturb(x_in, s):
        return (x_in.astype(jnp.float32) + 1e-30 * s).astype(x_in.dtype)

    mk = k_loop(apply_fn, out_to_scalar, perturb)
    t1 = _time_fetch(mk(K1), params, x)
    t2 = _time_fetch(mk(K2), params, x)
    dt = (t2 - t1) / (K2 - K1)
    mfu = flops / dt / V5E_PEAK if flops else 0.0
    print(
        f"{name:34s} {dt*1e3:9.2f} ms/batch  {dt/B*1e3:7.2f} ms/img"
        + (f"  MFU {mfu*100:5.1f}%" if flops else ""),
        flush=True,
    )
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model = WACNN(dtype=DT)
    x = jax.random.uniform(jax.random.key(0), (B, H, W, 3), jnp.float32)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )

    def flops_of(method, *args, **kw):
        try:
            fn = jax.jit(lambda p, xx: model.apply(p, xx, method=method))
            ca = fn.lower(params, x).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:
            return 0.0

    # full fused encode
    enc_flops = flops_of("encode_device")
    bench(
        "encode_device",
        lambda p, xx: model.apply(p, xx, method="encode_device"),
        params,
        x,
        lambda out: jnp.sum(out["y_symbols"].astype(jnp.float32))
        + jnp.sum(out["y_hat"].astype(jnp.float32))
        + jnp.sum(out["y_indexes"].astype(jnp.float32))
        + jnp.sum(out["z_symbols"].astype(jnp.float32)),
        flops=enc_flops,
    )

    # analyze only (g_a + h_a + z quantization)
    an_flops = flops_of("analyze")
    bench(
        "analyze (g_a+h_a)",
        lambda p, xx: model.apply(p, xx, method="analyze"),
        params,
        x,
        lambda out: jnp.sum(out[0].astype(jnp.float32))
        + jnp.sum(out[1].astype(jnp.float32)),
        flops=an_flops,
    )

    # g_a only
    def g_a_only(p, xx):
        def run(self, v):
            return self._seq(self.g_a, v)

        return model.apply(p, xx, method=run)

    bench(
        "g_a only",
        g_a_only,
        params,
        x,
        lambda out: jnp.sum(out.astype(jnp.float32)),
    )

    # hyper synthesis + slice params chain on z-shaped input
    z_hat = jnp.zeros((B, H // 64, W // 64, model.N), jnp.float32)

    def enc_tail(p, zz):
        def run(self, z_h):
            latent_scales = self._seq(self.h_scale_s, z_h)
            latent_means = self._seq(self.h_mean_s, z_h)
            table = self._scale_table()
            sc = self.slice_ch
            y = jnp.zeros((B, H // 16, W // 16, self.M), jnp.float32)
            y_hat_slices, acc = [], jnp.float32(0)
            from resdsic_tpu.entropy import gc_build_indexes, quantize_symbols

            for i in range(self.num_slices):
                y_slice = y[..., i * sc : (i + 1) * sc]
                support = self._support(y_hat_slices)
                mu, scale, mean_support = self._slice_mu_scale(
                    i, latent_means, latent_scales, support
                )
                idx = gc_build_indexes(scale, table)
                y_q = jnp.clip(quantize_symbols(y_slice, mu), -127, 127)
                y_hat_slice = y_q.astype(jnp.float32) + mu
                y_hat_slice = y_hat_slice + self._lrp(i, mean_support, y_hat_slice)
                y_hat_slices.append(y_hat_slice)
                acc = acc + jnp.sum(idx.astype(jnp.float32))
            return acc + jnp.sum(y_hat_slices[-1])

        return model.apply(p, zz, method=run)

    bench("hyper+10-slice tail", enc_tail, params, z_hat, lambda out: out)


if __name__ == "__main__":
    main()
