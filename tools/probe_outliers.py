"""Distribution of device-coder outliers (sidecar entries) at the trained
operating point: clamp vs split-overflow counts, value-delta and
position-gap histograms — sizes the sidecar entropy code (VERDICT r5 #1).

JAX_PLATFORMS=cpu PYTHONPATH=.:tools python tools/probe_outliers.py
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from eval_trained import eval_images  # noqa: E402

from resdsic_tpu.models import WACNN  # noqa: E402
from resdsic_tpu.models.codec import WACNNCodec  # noqa: E402
from resdsic_tpu.utils.checkpoint import load_params_npz  # noqa: E402


def main():
    model = WACNN()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    params = load_params_npz("artifacts_committed/cnn_q65_bf16.npz", params)
    x = jnp.asarray(eval_images(4))

    codec = WACNNCodec(model, params)
    codec.update()
    codec.coded_lanes = 512
    codec.autotune_coded(x)

    capv = codec._split_capv(x)
    skw = dict(
        split_tables=codec.split_tables,
        split_consts=codec._split_consts,
        split_capv=capv,
        interleave=True,
    )
    if codec.coded_word_cap:
        skw["cap"] = int(codec.coded_word_cap)
    out = codec._encode_coded_fn(
        codec.params, x, codec.dev_tables, lanes=512,
        sidecar_cap=int(codec.sidecar_cap or 4096), **skw
    )
    n_cl = np.asarray(out["n_clamped"])
    n_ov = np.asarray(out["n_overflow"])
    n_out = np.asarray(out["n_outliers"])
    print(f"n_clamped  (support clamps): {n_cl}")
    print(f"n_overflow (split-cap):      {n_ov}")
    print(f"n_outliers (sidecar total):  {n_out}")

    pos = np.asarray(out["outlier_pos"])
    dv = np.asarray(out["outlier_delta"])
    allgaps, allv = [], []
    for i in range(pos.shape[0]):
        n = int(n_out[i])
        p = np.sort(pos[i, :n].astype(np.int64))
        allgaps.append(np.diff(p, prepend=0))
        allv.append(dv[i, :n].astype(np.int64))
    gaps = np.concatenate(allgaps)
    vals = np.concatenate(allv)
    print(f"\nposition gaps: mean {gaps.mean():.1f} median {np.median(gaps):.0f} "
          f"p90 {np.percentile(gaps, 90):.0f} max {gaps.max()}")
    print(f"|dval|: mean {np.abs(vals).mean():.2f} median "
          f"{np.median(np.abs(vals)):.0f} p99 {np.percentile(np.abs(vals), 99):.0f} "
          f"max {np.abs(vals).max()}")
    hist = {int(v): int(c) for v, c in zip(*np.unique(vals, return_counts=True))}
    top = sorted(hist.items(), key=lambda kv: -kv[1])[:12]
    print(f"dval top values: {top}")
    # entropy estimates for the code design
    for name, arr in (("gaps", gaps), ("dval", vals)):
        u, c = np.unique(arr, return_counts=True)
        p = c / c.sum()
        print(f"H({name}) = {-(p * np.log2(p)).sum():.2f} bits/entry")


if __name__ == "__main__":
    main()
