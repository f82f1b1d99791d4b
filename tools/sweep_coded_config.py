"""TPU sweep: coded-path wall time AND container rate vs lane count / caps.

Picks the bench operating point for VERDICT r5 #1 (>=10x AND <=3% bpp
inflation): fewer lanes cut the per-image state/count header linearly but
lengthen every sequential scan; uncapped split budgets kill the overflow
sidecar but lengthen the value scans. Both axes measured together, on the
committed checkpoint at the bench batch size.

Run (TPU): PYTHONPATH=/root/.axon_site:. python tools/sweep_coded_config.py \
    [--batch 64] [--lanes 512 256 192 128] [--fracs 0.5 1.0]
"""

from __future__ import annotations

import argparse
import json
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lanes", type=int, nargs="+",
                    default=[512, 384, 256, 192])
    ap.add_argument("--fracs", type=float, nargs="+", default=[1.0])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--json-out", default="artifacts/coded_sweep.json")
    args = ap.parse_args()

    import bench  # repo-root bench: images + checkpoint candidates

    from resdsic_tpu.models import WACNN, WACNNCodec
    from resdsic_tpu.utils.checkpoint import load_params_npz

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
    imgs = bench.make_images(args.batch, trained=True)
    x = jnp.asarray(imgs)
    px = args.batch * x.shape[1] * x.shape[2]

    # host-coder truth for the inflation ratio
    out_h = codec.compress(x)
    host_bpp = sum(len(s) for g in out_h["strings"] for s in g) * 8 / px
    print(f"host bpp {host_bpp:.4f}", flush=True)

    results = []
    for frac in args.fracs:
        for lanes in args.lanes:
            codec.coded_lanes = lanes
            codec.split_cap_max_frac = frac
            codec.split_cap_quantile = 1.0 if frac > 0.5 else 0.999
            codec.coded_word_cap = None
            codec.sidecar_cap = codec.DEFAULT_SIDECAR_CAP
            codec.autotune_coded(x)
            t = time.perf_counter()
            out = codec.compress_coded(x)
            codec.decompress_coded(out["strings"], out["shape"])
            compile_s = time.perf_counter() - t
            times = []
            nbytes = 0
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = codec.compress_coded(x)
                rec = codec.decompress_coded(out["strings"], out["shape"])
                np.asarray(rec["x_hat"][:1, :1, :1])
                times.append(time.perf_counter() - t0)
                nbytes = sum(len(s) for s in out["strings"][0])
            bpp = nbytes * 8 / px
            row = {
                "lanes": lanes,
                "max_frac": frac,
                "s_per_image": round(min(times) / args.batch, 5),
                "bpp": round(bpp, 5),
                "inflation_pct": round(100 * (bpp / host_bpp - 1), 2),
                "compile_s": round(compile_s, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    out_p = REPO / args.json_out
    out_p.parent.mkdir(exist_ok=True)
    out_p.write_text(json.dumps(
        {"host_bpp": round(host_bpp, 5), "batch": args.batch,
         "sweep": results}, indent=2))
    print(f"wrote {out_p}")


if __name__ == "__main__":
    main()
