"""A/B the two Deconv formulations (lhs-dilated vs phase-packed subpixel)
on the real TPU at the three g_s shapes, same differencing harness as
profile_stages.py (K2-K1 loop differencing cancels the tunnel round trip).

Run: PYTHONPATH=/root/.axon_site:. python tools/ab_deconv.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flax import linen as nn

from resdsic_tpu.nn.conv import Deconv, pixel_shuffle

B = 16
DT = jnp.bfloat16
K1, K2 = 8, 40
REPS = 3


class DeconvDilated(nn.Module):
    features: int
    kernel_size: int = 5
    stride: int = 2
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        p = k // 2
        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + (s - 1)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        return jax.lax.conv_general_dilated(
            x.astype(DT), kernel.astype(DT), (1, 1),
            ((pad_lo, pad_hi), (pad_lo, pad_hi)), lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _looped(apply_fn, k):
    # The reduced scalar must cover the FULL output: a partial slice lets
    # XLA narrow the conv to just the sliced rows (observed: a 719 GF conv
    # "running" in 0.6 ms), which silently invalidates the measurement.
    def looped(p, x):
        def body(i, carry):
            x_in, acc = carry
            out = apply_fn(p, x_in)
            s = jnp.sum(out.astype(jnp.float32))
            x_next = (x_in.astype(jnp.float32) + 1e-20 * s).astype(x_in.dtype)
            return (x_next, acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    return jax.jit(looped)


def _t(fn, p, x):
    float(fn(p, x))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(p, x))
    return (time.perf_counter() - t0) / REPS


def bench(name, mod, shape):
    x = jax.random.normal(jax.random.key(0), shape, DT) * 0.1
    p = mod.init({"params": jax.random.key(0)}, x)
    t1 = _t(_looped(mod.apply, K1), p, x)
    t2 = _t(_looped(mod.apply, K2), p, x)
    dt = (t2 - t1) / (K2 - K1)
    print(f"{name:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    shapes = [
        ("320->192 @48x32", 192, (B, 48, 32, 320)),
        ("192->192 @96x64", 192, (B, 96, 64, 192)),
        ("192->192 @192x128", 192, (B, 192, 128, 192)),
        ("192->3 @384x256", 3, (B, 384, 256, 192)),
    ]
    for name, f, shp in shapes:
        bench(f"dilated  {name}", DeconvDilated(features=f), shp)
        bench(f"subpixel {name}", Deconv(features=f, use_bias=False, dtype=DT), shp)


if __name__ == "__main__":
    main()
