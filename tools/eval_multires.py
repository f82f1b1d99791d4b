"""Mixed-shape (CLIC-like) eval evidence (VERDICT r4 #8).

Builds a deterministic mixed-shape asset set (reference natural assets at
several crops + unseen-seed synthetic fields), then runs the eval_model
CLI pipeline — pad/unpad semantics of ref eval_model/__main__.py:89-101 —
over it in BOTH host-coder and device-coded modes with bucketed padding,
and records per-shape bpp/PSNR plus the recompile accounting (distinct
bucketed geometries vs distinct raw shapes).

Run (TPU): PYTHONPATH=/root/.axon_site:.:tools python tools/eval_multires.py
Writes docs/MULTIRES_r5.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

# CLIC-like mixed geometry (h, w) — none a multiple of 64 on purpose
SHAPES = [(768, 512), (500, 755), (1024, 680), (720, 1080), (333, 512)]


def build_assets():
    from train_flagship import _load_assets, make_batch

    rng = np.random.default_rng(31_337)  # unseen in training
    nat = _load_assets()
    imgs = []
    for i, (h, w) in enumerate(SHAPES):
        if i < len(nat) and nat[i % len(nat)].shape[0] >= h and nat[
            i % len(nat)
        ].shape[1] >= w:
            imgs.append(nat[i % len(nat)][:h, :w])
        else:
            big = make_batch(rng, nat, 1, max(h, w))[0]
            imgs.append(big[:h, :w])
    return imgs


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from train_flagship import load_params_npz

    from resdsic_tpu.cli.eval_model import inference
    from resdsic_tpu.models import WACNN, WACNNCodec
    from resdsic_tpu.ops.math import compute_bucketed_padding

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

    imgs = build_assets()
    buckets = set()
    raw_shapes = set()
    report = {"shapes": [], "modes": {}}
    for mode, coded in (("host", False), ("coded", True)):
        rows = []
        for im in imgs:
            h, w = im.shape[:2]
            raw_shapes.add((h, w))
            pad, _ = compute_bucketed_padding(h, w)  # (l, r, t, b)
            buckets.add((h + pad[2] + pad[3], w + pad[0] + pad[1]))
            x = jnp.asarray(im)[None]
            t0 = time.perf_counter()
            rv = inference(codec, x, coded=coded, bucket=True)
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            rv = inference(codec, x, coded=coded, bucket=True)
            steady = time.perf_counter() - t0
            rows.append({
                "shape": [h, w],
                "bpp": round(float(rv["bpp"]), 5),
                "psnr": round(float(rv["psnr"]), 3),
                "warm_s": round(warm, 3),
                "steady_s": round(steady, 3),
            })
            print(f"{mode} {h}x{w}: bpp {rv['bpp']:.4f} psnr "
                  f"{rv['psnr']:.2f} ({steady:.2f}s steady)", flush=True)
        report["modes"][mode] = rows
    report["distinct_raw_shapes"] = len(raw_shapes)
    report["distinct_bucketed_geometries"] = len(buckets)
    report["buckets"] = sorted(list(b) for b in buckets)
    report["note"] = (
        "bucketed padding bounds recompiles: each distinct bucketed "
        "geometry compiles once per direction; steady_s is the "
        "recompile-free revisit (ref eval_model pad/unpad semantics)"
    )
    dest = REPO / "docs" / "MULTIRES_r5.json"
    dest.write_text(json.dumps(report, indent=2))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
