"""Where does the coded-path encode time go at the trained 0.65-bpp point?

Breaks compress_coded wall time into:
  A. device program (encode_coded dispatch, scalar-fetch synced)
  B. + dense word-matrix / sidecar fetch (d2h payload)
  C. + host blob assembly (numpy pack)  == full compress_coded
and prints XLA cost analysis for the coded encode program.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_coded_encode.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from train_flagship import load_params_npz  # noqa: E402

from resdsic_tpu.models import WACNN, WACNNCodec  # noqa: E402

B, H, W = 16, 768, 512
REPS = 3


def med(fn):
    fn()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    print(f"devices: {jax.devices()}", flush=True)
    model = WACNN(dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    art = os.path.join(REPO, "artifacts_q65", "cnn_trained_bf16.npz")
    params = load_params_npz(art, params)
    codec = WACNNCodec(model, params)
    codec.update()
    codec.coded_lanes = 512

    import bench

    x = jnp.asarray(bench.make_images(B, trained=True))

    for split in (False, True):
        codec.coded_split = split
        codec.split_cap_frac = 0.5
        codec.coded_word_cap = None
        codec.sidecar_cap = codec.DEFAULT_SIDECAR_CAP
        out = codec.compress_coded(x)  # warms + persists adaptive budgets
        print(f"-- split={split} word_cap={codec.coded_word_cap} "
              f"sidecar_cap={codec.sidecar_cap}", flush=True)

        L = codec.coded_lanes
        capv = codec._split_capv(x)
        skw = dict(interleave=True)
        if split:
            skw.update(split_tables=codec.split_tables,
                       split_consts=codec._split_consts, split_capv=capv)
        if codec.coded_word_cap:
            skw["cap"] = int(codec.coded_word_cap)
        sk = int(codec.sidecar_cap or 0)

        def dev_only():
            o = codec._encode_coded_fn(
                codec.params, x, codec.dev_tables, lanes=L,
                sidecar_cap=sk, **skw)
            np.asarray(o["n_clamped"])  # scalar sync
            return o

        t_dev = med(dev_only)
        o = dev_only()

        def with_fetch():
            o = codec._encode_coded_fn(
                codec.params, x, codec.dev_tables, lanes=L,
                sidecar_cap=sk, **skw)
            counts = np.asarray(o["counts"])
            np.asarray(o["states"])
            cmax = int(counts.max())
            cap = o["words"].shape[1]
            cap_fetch = min(codec._bucket(max(cmax, 1), lo=16), cap)
            dense = np.asarray(
                codec._dense_prefix(o["words"], cap_fetch)
                if cap_fetch < cap else o["words"])
            if sk:
                n_out = np.asarray(o["n_outliers"])
                codec._fetch_outliers(o, n_out, sk)
            return dense

        t_fetch = med(with_fetch)
        t_full = med(lambda: codec.compress_coded(x))

        cap = o["words"].shape[1]
        counts = np.asarray(o["counts"])
        print(f"word matrix (B*L, cap)=({16*L},{cap}) u16 = "
              f"{16*L*cap*2/1e6:.2f} MB; counts max {counts.max()} "
              f"mean {counts.mean():.1f}", flush=True)
        print(f"A device program   {t_dev/B*1e3:7.2f} ms/img", flush=True)
        print(f"B +payload fetch   {t_fetch/B*1e3:7.2f} ms/img "
              f"(+{(t_fetch-t_dev)/B*1e3:.2f})", flush=True)
        print(f"C full compress    {t_full/B*1e3:7.2f} ms/img "
              f"(+{(t_full-t_fetch)/B*1e3:.2f} host pack)", flush=True)
        try:
            ca = codec._encode_coded_fn.lower(
                codec.params, x, codec.dev_tables, lanes=L,
                sidecar_cap=sk, **skw).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            print(f"XLA flops {ca.get('flops', 0)/1e9:.1f} G  "
                  f"bytes {ca.get('bytes accessed', 0)/1e9:.2f} GB",
                  flush=True)
        except Exception as e:
            print(f"cost_analysis unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
