"""Pipelined coded-path headline at the v6 rate-target config
(L=256, uncapped split budgets) — the VERDICT r5 #1 decision point.

Run: PYTHONPATH=/root/.axon_site:. python tools/exp_pipe_l256.py [lanes]
"""

import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import bench

    from resdsic_tpu.models import StreamingCodec, WACNN, WACNNCodec
    from resdsic_tpu.utils.checkpoint import load_params_npz

    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    B = 64
    print(f"devices: {jax.devices()}", flush=True)
    model = WACNN(dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    params = load_params_npz(
        str(REPO / "artifacts_committed" / "cnn_q65_bf16.npz"), params
    )
    codec = WACNNCodec(model, params)
    codec.update()
    x = jnp.asarray(bench.make_images(B, trained=True))
    px = B * x.shape[1] * x.shape[2]

    codec.coded_lanes = lanes
    codec.split_cap_max_frac = 1.0
    codec.split_cap_quantile = 1.0
    codec.autotune_coded(x)
    out = codec.compress_coded(x)
    codec.decompress_coded(out["strings"], out["shape"])
    out = codec.compress_coded(x)
    bpp = sum(len(s) for s in out["strings"][0]) * 8 / px
    print(f"coded bpp {bpp:.4f}", flush=True)

    stream = StreamingCodec(
        codec, n_encode_workers=3, n_decode_workers=3, max_inflight=5,
        coded=True,
    )
    batches = [x for _ in range(6)]
    stream.map(batches[:2])
    for _ in range(3):
        t0 = time.perf_counter()
        stream.map(batches)
        dt = (time.perf_counter() - t0) / (len(batches) * B)
        print(f"pipelined {dt:.5f} s/img  vs_baseline {0.24/dt:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
