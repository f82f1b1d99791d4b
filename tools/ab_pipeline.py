"""Sweep StreamingCodec worker/inflight settings on the coded path.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_pipeline.py
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

from resdsic_tpu.models import WACNN, WACNNCodec, StreamingCodec  # noqa: E402

B, H, W = 64, 768, 512
N_BATCH = 6


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
    codec.autotune_coded(x)
    out = codec.compress_coded(x)  # warm + persist budgets
    codec.decompress_coded(out["strings"], out["shape"])

    batches = [x for _ in range(N_BATCH)]
    for ne, nd, infl in [(3, 2, 4), (2, 2, 3), (2, 3, 4), (3, 3, 5),
                         (4, 2, 5)]:
        s = StreamingCodec(codec, n_encode_workers=ne, n_decode_workers=nd,
                           max_inflight=infl, coded=True)
        s.map(batches[:2])
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            s.map(batches)
            runs.append((time.perf_counter() - t0) / (N_BATCH * B))
        print(f"enc={ne} dec={nd} inflight={infl}: "
              f"{sorted(runs)[1]*1e3:.2f} ms/img "
              f"(spread {min(runs)*1e3:.2f}-{max(runs)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
