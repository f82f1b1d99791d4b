"""Ablate the ENCODE-scan step cost: u32 div emulation vs float-recip div.

Same measurement discipline as ablate_scan.py: one dispatch in flight,
fetch-synced, fixed tunnel round trip cancelled by differencing K=1 vs
K=3 fori_loop repeats inside one jitted program.

Run: PYTHONPATH=/root/.axon_site:. python tools/ablate_encode.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, L, T = 16, 512, 996
MASK16 = jnp.uint32(0xFFFF)
RANS_L = jnp.uint32(1 << 16)
PRECISION = 16


def timed(name, scan_fn, *args):
    def k_loop(k):
        def run(states, *a):
            def body(i, st):
                return scan_fn(st, *a)

            return jax.lax.fori_loop(0, k, body, states)

        return jax.jit(run)

    states0 = jnp.full((B, L), 1 << 16, jnp.uint32)

    def t(fn):
        float(jnp.sum(fn(states0, *args).astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(2):
            float(jnp.sum(fn(states0, *args).astype(jnp.float32)))
        return (time.perf_counter() - t0) / 2

    t1, t3 = t(k_loop(1)), t(k_loop(3))
    per = (t3 - t1) / 2
    print(f"{name:34s} {per*1e3:8.1f} ms/scan  {per/T*1e6:7.1f} us/step", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    # realistic packed entries: freq in [1, 0xffff], lo <= 0x10000 - freq
    f_np = rng.integers(1, 1 << 16, (T, B, L)).astype(np.uint32)
    lo_np = (rng.random((T, B, L)) * ((1 << 16) - f_np)).astype(np.uint32)
    pre_t = jnp.asarray(((lo_np << 16) | f_np).view(np.int32))

    # A: round-2 encode step — native u32 // and %
    def enc_div(states, pre_t):
        def step(st, p_i32):
            p = jax.lax.bitcast_convert_type(p_i32, jnp.uint32)
            f = p & MASK16
            c = p >> 16
            need = st >= (f << 16)
            word = (st & MASK16).astype(jnp.int32)
            x = jnp.where(need, st >> 16, st)
            x = ((x // f) << PRECISION) + (x % f) + c
            return x, (need, word)

        st, _ = jax.lax.scan(step, states, pre_t, reverse=True)
        return st

    # B: float-recip divmod + exact integer corrections (device_ans path)
    def enc_recip(states, pre_t):
        from resdsic_tpu.coding.device_ans import divmod_u32_u16

        def step(st, p_i32):
            p = jax.lax.bitcast_convert_type(p_i32, jnp.uint32)
            f = p & MASK16
            c = p >> 16
            need = st >= (f << 16)
            word = (st & MASK16).astype(jnp.int32)
            x = jnp.where(need, st >> 16, st)
            q, r = divmod_u32_u16(x, f)
            x = (q << PRECISION) + r + c
            return x, (need, word)

        st, _ = jax.lax.scan(step, states, pre_t, reverse=True)
        return st

    # C: no division at all (mul-only floor — NOT a correct coder, cost floor)
    def enc_nodiv(states, pre_t):
        def step(st, p_i32):
            p = jax.lax.bitcast_convert_type(p_i32, jnp.uint32)
            f = p & MASK16
            c = p >> 16
            need = st >= (f << 16)
            word = (st & MASK16).astype(jnp.int32)
            x = jnp.where(need, st >> 16, st)
            x = ((x >> 8) * f + (x & jnp.uint32(0xFF))) + c
            return x | RANS_L, (need, word)

        st, _ = jax.lax.scan(step, states, pre_t, reverse=True)
        return st

    # D: recip step + emitted ys (flags+words as in production)
    def enc_recip_ys(states, pre_t):
        from resdsic_tpu.coding.device_ans import divmod_u32_u16

        def step(st, p_i32):
            p = jax.lax.bitcast_convert_type(p_i32, jnp.uint32)
            f = p & MASK16
            c = p >> 16
            need = st >= (f << 16)
            word = (st & MASK16).astype(jnp.int32)
            x = jnp.where(need, st >> 16, st)
            q, r = divmod_u32_u16(x, f)
            x = (q << PRECISION) + r + c
            return x, (need, word)

        st, (flags, words) = jax.lax.scan(step, states, pre_t, reverse=True)
        return st + jnp.sum(words[0]).astype(jnp.uint32)

    for name, fn in [
        ("A encode u32 div (round-2)", enc_div),
        ("B encode recip divmod", enc_recip),
        ("C encode no div (floor)", enc_nodiv),
        ("D recip + ys emission", enc_recip_ys),
    ]:
        timed(name, fn, pre_t)


if __name__ == "__main__":
    main()
