"""RD point + estimate-vs-real-codec agreement for the trained flagship.

The reference's de-facto correctness loop (src/compress/training/step.py:
158-330) cross-checks likelihood-estimated bpp against real rANS byte
counts every few epochs; this tool runs that check on the trained
artifact (tools/train_flagship.py) and records an RD point next to the
published WACNN Kodak anchors (results/cnn_mse_Kodak.json — different
content, so the anchor row is context, not a claim of parity).

Run (TPU): PYTHONPATH=/root/.axon_site:. python tools/eval_trained.py
Writes artifacts/rd_point.json and docs/RD_r3.json (committable copy).
"""

from __future__ import annotations

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
sys.path.insert(0, str(REPO / "tools"))

H, W = 768, 512
ANCHORS = {  # results/cnn_mse_Kodak.json (natural-photo Kodak, for context)
    "bpp": [0.127, 0.199, 0.309, 0.449, 0.649, 0.895],
    "psnr": [29.22, 30.59, 32.26, 34.15, 35.91, 37.72],
}


def eval_images():
    """768x512 crops: unseen-seed synthetic + the reference's natural
    assets (prova/detail crops)."""
    from train_flagship import _load_assets, make_batch

    rng = np.random.default_rng(10_000)  # seeds never used in training
    imgs = list(make_batch(rng, [], 4, 768)[:, :, :512])  # synthetic-only
    for a in _load_assets():
        ah, aw = a.shape[:2]
        if ah >= H and aw >= W:
            imgs.append(a[:H, :W])
            imgs.append(a[ah - H :, aw - W :])
    return np.stack(imgs[:8])


def main():
    import argparse

    from train_flagship import load_params_npz

    from resdsic_tpu.models import WACNN, WACNNCodec

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--npz", default=str(REPO / "artifacts" / "cnn_trained_bf16.npz"),
        help="trained-params artifact (tools/train_flagship.py)",
    )
    ap.add_argument(
        "--tag", default="lmbda_0.025",
        help="RD-point key in docs/RD_r3.json (points merge across runs)",
    )
    args = ap.parse_args()

    art = Path(args.npz)
    if not art.exists():
        print("no trained artifact; run tools/train_flagship.py first",
              file=sys.stderr)
        sys.exit(1)

    print(f"devices: {jax.devices()}", flush=True)
    model = WACNN()  # f32 eval (quality numbers)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    params = load_params_npz(str(art), params)

    x = jnp.asarray(eval_images())
    b = x.shape[0]

    # --- likelihood-estimated bpp + distortion (forward path) ---
    out = jax.jit(lambda p, xx: model.apply(p, xx, training=False))(params, x)
    num_pixels = b * H * W
    est_bpp = float(sum(
        -jnp.sum(jnp.log2(l)) for l in out["likelihoods"].values()
    )) / num_pixels
    mse = float(jnp.mean((out["x_hat"] - x) ** 2))
    psnr = -10 * np.log10(mse)

    # Bypass-aware estimate: the continuous-model estimate charges tail
    # symbols up to 30 bits (likelihood floor 1e-9) while the real coder
    # escape/bypass-codes them at ~escape+16 raw bits (reference
    # semantics, rans.cpp:134-152) — cap the per-symbol estimate at 16
    # bits for an apples-to-apples gap on heavy-tail content.
    bits_y = -jnp.log2(out["likelihoods"]["y"])
    bits_z = -jnp.log2(out["likelihoods"]["z"])
    est_bpp_bypass = float(
        jnp.sum(jnp.minimum(bits_y, 16.0)) + jnp.sum(jnp.minimum(bits_z, 16.0))
    ) / num_pixels

    # Table-aware estimate: the real coder quantizes each element's scale
    # UP to the next of 64 table entries (gc_build_indexes — identical
    # semantics to the reference's 64-step loop), which cheapens heavy
    # tails and charges centers slightly more. Evaluating the SAME
    # Gaussian bits at the quantized scale is the rate the integer tables
    # actually imply; real bytes track it to <1% (the residue is pmf
    # integer quantization + escape mass + per-stream flush). The
    # continuous-estimate gap above it is a property of table-coded
    # systems — the reference's coder shares it — not a coder defect
    # (diagnosed round 3: gap_table_aware 0.7% while gap_bypass_aware sat
    # at 2.3-3.3% across three checkpoints of the same lambda).
    codec = WACNNCodec(model, params)
    codec.update()
    from resdsic_tpu.entropy import get_scale_table
    from resdsic_tpu.entropy.entropy_models import _standardized_cumulative

    enc_dev = codec._encode_fn(codec.params, x)
    st = jnp.asarray(get_scale_table()).astype(jnp.float32)

    @jax.jit
    def _table_bits(sym, idx):
        v = jnp.abs(sym.astype(jnp.float32))
        s = st[idx.astype(jnp.int32)]
        p = _standardized_cumulative((0.5 - v) / s) - _standardized_cumulative(
            (-0.5 - v) / s
        )
        return jnp.sum(jnp.minimum(-jnp.log2(jnp.maximum(p, 1e-9)), 16.0))

    est_bpp_table = (
        float(_table_bits(enc_dev["y_symbols"], enc_dev["y_indexes"]))
        + float(jnp.sum(jnp.minimum(bits_z, 16.0)))
    ) / num_pixels

    # --- real-codec bpp (host rANS, reference-format streams) ---
    enc = codec.compress(x)
    real_bytes = sum(len(s) for g in enc["strings"] for s in g)
    real_bpp = real_bytes * 8 / num_pixels
    rec = codec.decompress(enc["strings"], enc["shape"])
    mse_r = float(jnp.mean((jnp.clip(rec["x_hat"], 0, 1) - x) ** 2))
    psnr_r = -10 * np.log10(mse_r)

    # --- device-coded path (single-dispatch on-device rANS + sidecar) ---
    t0 = time.time()
    cenc = codec.compress_coded(x, return_debug=True)
    coded_ok = cenc["format"] == "device-ans"
    coded_bytes = sum(len(s) for s in cenc["strings"][0]) if coded_ok else 0
    coded_bpp = coded_bytes * 8 / num_pixels
    crec = codec.decompress_coded(cenc["strings"], cenc["shape"])
    coded_bit_exact = bool(jnp.all(cenc["y_hat"] == crec["y_hat"]))
    mse_c = float(jnp.mean((jnp.clip(crec["x_hat"], 0, 1) - x) ** 2))
    psnr_c = -10 * np.log10(mse_c)

    gap = abs(real_bpp - est_bpp) / max(est_bpp, 1e-9)
    gap_bypass = abs(real_bpp - est_bpp_bypass) / max(est_bpp_bypass, 1e-9)
    gap_table = abs(real_bpp - est_bpp_table) / max(est_bpp_table, 1e-9)
    result = {
        "images": int(b),
        "resolution": [H, W],
        "estimated_bpp": round(est_bpp, 5),
        "estimated_bpp_bypass_aware": round(est_bpp_bypass, 5),
        "estimated_bpp_table_aware": round(est_bpp_table, 5),
        "real_codec_bpp": round(real_bpp, 5),
        "estimate_vs_real_gap": round(gap, 5),
        "estimate_vs_real_gap_bypass_aware": round(gap_bypass, 5),
        "estimate_vs_real_gap_table_aware": round(gap_table, 5),
        # correctness criterion: real bytes must track the rate the
        # integer tables imply; the continuous->table delta is a known
        # modeling trade shared with the reference, reported above
        "gap_ok_lt_2pct": bool(gap_table < 0.02),
        "psnr_forward": round(psnr, 3),
        "psnr_real_codec": round(psnr_r, 3),
        "device_coded": {
            "format": cenc["format"],
            "bpp": round(coded_bpp, 5),
            "bit_exact_vs_encoder": coded_bit_exact,
            "psnr": round(psnr_c, 3),
        },
        "anchors_kodak_cnn": ANCHORS,
        "note": (
            "trained on the deterministic synthetic+asset recipe "
            "(tools/train_flagship.py) — published Kodak anchors shown "
            "for context; content differs so RD parity vs anchors is not "
            "claimed (published checkpoints unreachable: no egress)"
        ),
    }
    print(json.dumps(result, indent=2))
    (REPO / "artifacts").mkdir(exist_ok=True)
    (REPO / "artifacts" / "rd_point.json").write_text(
        json.dumps(result, indent=2)
    )
    # docs/RD_r3.json holds one entry per trained operating point (a
    # 2-point curve from the lmbda=0.025 and lmbda=0.013 recipes); points
    # from other tags are preserved so the runs can happen in any order.
    rd_path = REPO / "docs" / "RD_r3.json"
    merged: dict = {}
    if rd_path.exists():
        try:
            prev = json.loads(rd_path.read_text())
            # migrate the legacy single-point layout
            merged = prev if "points" in prev else {"points": {
                "lmbda_0.025": {
                    k: v for k, v in prev.items()
                    if k not in ("anchors_kodak_cnn", "note")
                }
            }}
        except (ValueError, KeyError):
            merged = {}
    merged.setdefault("points", {})[args.tag] = {
        k: v for k, v in result.items()
        if k not in ("anchors_kodak_cnn", "note")
    }
    merged["anchors_kodak_cnn"] = ANCHORS
    merged["note"] = result["note"]
    rd_path.write_text(json.dumps(merged, indent=2))


if __name__ == "__main__":
    main()
