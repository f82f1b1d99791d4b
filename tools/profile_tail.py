"""Break down the encode tail: cc stacks vs gc_build_indexes vs LRP.

Run: PYTHONPATH=/root/.axon_site:. python tools/profile_tail.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from resdsic_tpu.entropy import gc_build_indexes, get_scale_table
from resdsic_tpu.ops.math import lower_bound

B = 16
K1, K2 = 2, 10
REPS = 3


def _time_fetch(fn, *args):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(fn(*args))
    return (time.perf_counter() - t0) / REPS


def bench(name, f, x):
    def mk(k):
        def looped(xx):
            def body(i, carry):
                x_in, acc = carry
                out = f(x_in)
                s = jnp.sum(out.astype(jnp.float32))
                return ((x_in.astype(jnp.float32) + 1e-20 * s).astype(x_in.dtype), acc + s)

            _, acc = jax.lax.fori_loop(0, k, body, (xx, jnp.float32(0)))
            return acc

        return jax.jit(looped)

    t1 = _time_fetch(mk(K1), x)
    t2 = _time_fetch(mk(K2), x)
    dt = (t2 - t1) / (K2 - K1)
    print(f"{name:44s} {dt*1e3:9.3f} ms/batch", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    table = jnp.asarray(get_scale_table())
    scale = jax.random.uniform(jax.random.key(0), (B, 48, 32, 32), jnp.float32) * 3

    bench("gc_build_indexes (searchsorted) 1 slice", lambda s: gc_build_indexes(s, table), scale)

    def bcast_idx(s):
        s = lower_bound(s.astype(jnp.float32), jnp.float32(0.11))
        return jnp.sum(
            (table[:-1][None, None, None, None, :] < s[..., None]).astype(jnp.int32),
            axis=-1,
        )

    bench("gc_build_indexes (broadcast-sum) 1 slice", bcast_idx, scale)

    y = jax.random.normal(jax.random.key(1), (B, 48, 32, 32), jnp.float32)
    bench("round+clip+int8 1 slice", lambda v: jnp.clip(jnp.round(v), -127, 127).astype(jnp.int8), y)
    bench("lrp-ish tanh 1 slice", lambda v: 0.5 * jnp.tanh(v), y)

    # parity check
    a = gc_build_indexes(scale, table)
    b = bcast_idx(scale)
    print("exact equal:", bool(jnp.all(a == b)), flush=True)


if __name__ == "__main__":
    main()
