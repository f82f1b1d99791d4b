"""Ablate the decode-scan step to find the per-iteration cost driver.

Each variant is timed with ONE dispatch in flight (fetch-synced) — never
queue multiple heavy executions on the axon tunnel — and the fixed ~25 ms
round trip is cancelled by differencing a K=1 vs K=3 repeat loop INSIDE
one jitted program (fori_loop around the scan, data-dependent carry).

Run: PYTHONPATH=/root/.axon_site:. python tools/ablate_scan.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, L, T = 16, 512, 996
R = 256
NW = 1 << 18
MASK16 = jnp.uint32(0xFFFF)
RANS_L = jnp.uint32(1 << 16)


def timed(name, scan_fn, *args):
    def k_loop(k):
        def run(states, *a):
            def body(i, st):
                out_states = scan_fn(st, *a)
                return out_states

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
    rows_t = jnp.asarray(rng.integers(0, R, (T, B, L)).astype(np.int32))
    dlut = jnp.asarray(rng.integers(1, 1 << 30, (R, 1 << 16)).astype(np.int32))
    words = jnp.asarray(rng.integers(0, 1 << 15, (NW,)).astype(np.int32))
    bases = jnp.asarray(rng.integers(0, NW - T, (B, L)).astype(np.int32))

    # A: full decode-shaped step (dlut gather + word gather + renorm)
    def full(states, rows_t, dlut, words, bases):
        def step(c, r):
            st, ptrs = c
            peek = (st & MASK16).astype(jnp.int32)
            e = jax.lax.bitcast_convert_type(
                dlut.reshape(-1)[r * (1 << 16) + peek], jnp.uint32
            )
            x = (e >> 16) * (st >> 16) + (e & MASK16)
            need = x < RANS_L
            w = words[jnp.clip(bases + ptrs, 0, NW - 1)].astype(jnp.uint32)
            x = jnp.where(need, (x << 16) | (w & MASK16), x)
            return (x | RANS_L, ptrs + need.astype(jnp.int32)), peek

        (st, _), peeks = jax.lax.scan(
            step, (states, jnp.zeros((B, L), jnp.int32)), rows_t
        )
        return st + jnp.sum(peeks[-1]).astype(jnp.uint32)

    # B: no word gather
    def no_word(states, rows_t, dlut, words, bases):
        def step(c, r):
            st = c
            peek = (st & MASK16).astype(jnp.int32)
            e = jax.lax.bitcast_convert_type(
                dlut.reshape(-1)[r * (1 << 16) + peek], jnp.uint32
            )
            x = (e >> 16) * (st >> 16) + (e & MASK16)
            return x | RANS_L, peek

        st, peeks = jax.lax.scan(step, states, rows_t)
        return st + jnp.sum(peeks[-1]).astype(jnp.uint32)

    # C: word gather only (no table gather)
    def word_only(states, rows_t, dlut, words, bases):
        def step(c, r):
            st, ptrs = c
            x = st * jnp.uint32(2654435761) + r.astype(jnp.uint32)
            need = x < (jnp.uint32(1) << 31)
            w = words[jnp.clip(bases + ptrs, 0, NW - 1)].astype(jnp.uint32)
            x = jnp.where(need, x | (w & MASK16), x)
            return (x | RANS_L, ptrs + need.astype(jnp.int32)), x & MASK16

        (st, _), o = jax.lax.scan(
            step, (states, jnp.zeros((B, L), jnp.int32)), rows_t
        )
        return st + jnp.sum(o[-1]).astype(jnp.uint32)

    # D: pure ALU, no gathers at all
    def alu(states, rows_t, dlut, words, bases):
        def step(st, r):
            x = st * jnp.uint32(2654435761) + r.astype(jnp.uint32)
            x = (x >> 16) * jnp.uint32(31337) + (x & MASK16)
            return x | RANS_L, x & MASK16

        st, o = jax.lax.scan(step, states, rows_t)
        return st + jnp.sum(o[-1]).astype(jnp.uint32)

    # E: like D but no per-step ys output (carry only)
    def alu_no_ys(states, rows_t, dlut, words, bases):
        def step(st, r):
            x = st * jnp.uint32(2654435761) + r.astype(jnp.uint32)
            x = (x >> 16) * jnp.uint32(31337) + (x & MASK16)
            return x | RANS_L, None

        st, _ = jax.lax.scan(step, states, rows_t)
        return st

    # F: small-table gather (64 KB table instead of 64 MB)
    small = jnp.asarray(rng.integers(1, 1 << 30, (R * 64,)).astype(np.int32))

    def small_gather(states, rows_t, dlut, words, bases):
        def step(st, r):
            peek = (st & MASK16).astype(jnp.int32)
            e = jax.lax.bitcast_convert_type(
                small[r * 64 + (peek & 63)], jnp.uint32
            )
            x = (e >> 16) * (st >> 16) + (e & MASK16)
            return x | RANS_L, peek

        st, o = jax.lax.scan(step, states, rows_t)
        return st + jnp.sum(o[-1]).astype(jnp.uint32)

    for name, fn in [
        ("A full (dlut+word)", full),
        ("B dlut gather only", no_word),
        ("C word gather only", word_only),
        ("D pure ALU + ys", alu),
        ("E pure ALU no ys", alu_no_ys),
        ("F small-table gather", small_gather),
    ]:
        timed(name, fn, rows_t, dlut, words, bases)


if __name__ == "__main__":
    main()
