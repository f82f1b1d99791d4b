"""A/B the significance-split decision at the trained 0.65-bpp point.

The autotuned tail budget at this operating point (densest slice ~0.30
nonzero, lane length 96) crosses the 0.45 split-off threshold, so the
bench fell back to the gather-bound table decode. This measures what the
threshold decision is actually worth: coded compress+decompress timed
with (a) autotune's choice, (b) split forced on at the T/2 default cap,
(c) split forced on at a 2.5-sigma cap (overflow rides the lossless
sidecar).

Run: PYTHONPATH=/root/.axon_site:. python tools/ab_split_trained.py
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


def bench_content(n):
    sys.path.insert(0, REPO)
    import bench

    return bench.make_images(n, trained=True)


def time_path(codec, x, label):
    out = codec.compress_coded(x)  # compile + adaptive re-dispatch
    codec.decompress_coded(out["strings"], out["shape"])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = codec.compress_coded(x)
        t1 = time.perf_counter()
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.asarray(rec["x_hat"][:1, :1, :1])
        t2 = time.perf_counter()
        ts.append((t1 - t0, t2 - t1, t2 - t0))
    enc, dec, tot = sorted(ts, key=lambda r: r[2])[1]
    nbytes = sum(len(s) for s in out["strings"][0])
    bpp = nbytes * 8 / (B * H * W)
    print(
        f"{label}: enc {enc/B*1e3:.2f}ms/img dec {dec/B*1e3:.2f}ms/img "
        f"total {tot/B*1e3:.2f}ms/img bpp {bpp:.3f}",
        flush=True,
    )


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
    x = jnp.asarray(bench_content(B))

    tune = codec.autotune_coded(x)
    print("autotune:", {k: (round(v, 4) if isinstance(v, float) else v)
                        for k, v in tune.items() if k != "nonzero_rate_per_slice"},
          flush=True)
    print("per-slice nz:", [round(v, 3) for v in tune["nonzero_rate_per_slice"]],
          flush=True)
    time_path(codec, x, "autotune (split=%s)" % codec.coded_split)

    codec.coded_split = True
    codec.split_cap_frac = 0.5  # T/2 in-model default
    codec.coded_word_cap = None
    time_path(codec, x, "split cap=0.50")

    s_max = tune["nonzero_rate_max"]
    ts = 96  # (768//16)*(512//16)*32 / 512 lanes
    cap = s_max + 2.5 * float(np.sqrt(s_max * (1 - s_max) / ts))
    codec.coded_split = True
    codec.split_cap_frac = min(0.499, cap)
    codec.coded_word_cap = None
    time_path(codec, x, f"split cap={codec.split_cap_frac:.3f}")


if __name__ == "__main__":
    main()
