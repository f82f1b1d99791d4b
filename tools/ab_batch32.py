"""Does batch 32 beat batch 16 on coded-path throughput (s/image)?

Larger batches amortize dispatch/tunnel overhead and fill the MXU better
on the transform convs; the cost is 2x activation memory and longer
per-dispatch wall time. Times the sequential coded path (split cap 0.5,
the serving configuration) at both batch sizes with the trained q65
checkpoint.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_batch32.py
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

H, W = 768, 512


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
    codec.coded_split = True
    codec.split_cap_frac = 0.5

    import bench

    imgs = bench.make_images(64, trained=True)

    for b in (32, 64):
        codec.coded_word_cap = None
        codec.sidecar_cap = codec.DEFAULT_SIDECAR_CAP
        x = jnp.asarray(imgs[:b])
        out = codec.compress_coded(x)
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
        print(
            f"B={b}: enc {enc/b*1e3:.2f} dec {dec/b*1e3:.2f} "
            f"total {tot/b*1e3:.2f} ms/img bpp {nbytes*8/(b*H*W):.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
