"""RD points + estimate-vs-real-codec agreement for trained artifacts.

The reference's de-facto correctness loop (src/compress/training/step.py:
158-330) cross-checks likelihood-estimated bpp against real rANS byte
counts every few epochs; this tool runs that check on trained artifacts
(tools/train_flagship.py) and records RD points next to the published
WACNN Kodak anchors (results/cnn_mse_Kodak.json — different content, so
the anchor row is context, not a claim of parity).

Supports both the WACNN flagship (--model cnn, default) and the scalable
flagship (--model ind): for ind it reports PER-LEVEL {bpp_base, bpp_prog,
psnr} from real byte lengths with the reference's stream split
(compress_with_ac, step.py:271-291: base = strings[:2], prog = z_prog +
the 10 per-slice strings), plus device-coded bit-exactness per level.

Run (TPU): PYTHONPATH=/root/.axon_site:. python tools/eval_trained.py
Writes artifacts/rd_point.json and docs/RD_r4.json (committable copy).
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


def eval_images(n: int = 24):
    """768x512 crops: unseen-seed synthetic + the reference's natural
    assets (prova/detail crops). Seeds disjoint from training."""
    from train_flagship import _load_assets, make_batch

    rng = np.random.default_rng(10_000)  # seeds never used in training
    imgs = []
    for a in _load_assets():
        ah, aw = a.shape[:2]
        if ah >= H and aw >= W:
            imgs.append(a[:H, :W])
            imgs.append(a[ah - H :, aw - W :])
    n_syn = max(0, n - len(imgs))
    while n_syn > 0:
        take = min(4, n_syn)
        imgs.extend(list(make_batch(rng, [], take, 768)[:, :, :512]))
        n_syn -= take
    return np.stack(imgs[:n])


def per_image_psnr(x_hat, x):
    mse = jnp.mean(
        (jnp.clip(x_hat, 0, 1).astype(jnp.float32) - x) ** 2, axis=(1, 2, 3)
    )
    return -10 * np.log10(np.asarray(mse))


def spread(vals) -> dict:
    a = np.asarray(vals, np.float64)
    return {
        "mean": round(float(a.mean()), 4),
        "min": round(float(a.min()), 4),
        "max": round(float(a.max()), 4),
        "std": round(float(a.std()), 4),
    }


def merge_rd(rd_path: Path, tag: str, point: dict, note: str):
    merged: dict = {}
    if rd_path.exists():
        try:
            prev = json.loads(rd_path.read_text())
            merged = prev if "points" in prev else {"points": {
                "lmbda_0.025": {
                    k: v for k, v in prev.items()
                    if k not in ("anchors_kodak_cnn", "note")
                }
            }}
        except (ValueError, KeyError):
            merged = {}
    merged.setdefault("points", {})[tag] = point
    merged["anchors_kodak_cnn"] = ANCHORS
    merged["note"] = note
    rd_path.write_text(json.dumps(merged, indent=2))


NOTE = (
    "trained on the deterministic synthetic+asset recipe "
    "(tools/train_flagship.py) — published Kodak anchors shown "
    "for context; content differs so RD parity vs anchors is not "
    "claimed (published checkpoints unreachable: no egress)"
)


def table_bits_fn():
    """Rate the integer tables imply: the SAME Gaussian bits evaluated at
    the coder's quantized scale (64-entry table, scale rounded up —
    identical semantics to the reference's 64-step index loop), bypass-
    capped at 16 bits. Real bytes track this to <1%; the continuous
    estimate above it is the scale-table quantization trade every
    table-coded system (the reference included) makes."""
    from resdsic_tpu.entropy import get_scale_table
    from resdsic_tpu.entropy.entropy_models import _standardized_cumulative

    st = jnp.asarray(get_scale_table()).astype(jnp.float32)

    @jax.jit
    def _table_bits(sym, idx):
        v = jnp.abs(sym.astype(jnp.float32))
        s = st[idx.astype(jnp.int32)]
        p = _standardized_cumulative((0.5 - v) / s) - _standardized_cumulative(
            (-0.5 - v) / s
        )
        return jnp.sum(jnp.minimum(-jnp.log2(jnp.maximum(p, 1e-9)), 16.0))

    return _table_bits


def eval_cnn(args, x):
    from train_flagship import load_params_npz

    from resdsic_tpu.models import TCM, WACNN, WACNNCodec

    # f32 eval (quality numbers); TCM shares the whole codec runtime so
    # the same evaluation path covers it (VERDICT r4 next #6)
    model = TCM() if args.model == "tcm" else WACNN()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    params = load_params_npz(args.npz, params)
    b = x.shape[0]
    num_pixels = b * H * W

    # --- likelihood-estimated bpp + distortion (forward path) ---
    out = jax.jit(lambda p, xx: model.apply(p, xx, training=False))(params, x)
    est_bpp = float(sum(
        -jnp.sum(jnp.log2(l)) for l in out["likelihoods"].values()
    )) / num_pixels
    psnr_fwd = per_image_psnr(out["x_hat"], x)

    bits_y = -jnp.log2(out["likelihoods"]["y"])
    bits_z = -jnp.log2(out["likelihoods"]["z"])
    est_bpp_bypass = float(
        jnp.sum(jnp.minimum(bits_y, 16.0)) + jnp.sum(jnp.minimum(bits_z, 16.0))
    ) / num_pixels

    codec = WACNNCodec(model, params)
    codec.update()
    enc_dev = codec._encode_fn(codec.params, x)
    tb = table_bits_fn()
    est_bpp_table = (
        float(tb(enc_dev["y_symbols"], enc_dev["y_indexes"]))
        + float(jnp.sum(jnp.minimum(bits_z, 16.0)))
    ) / num_pixels

    # --- real-codec bpp (host rANS, reference-format streams) ---
    enc = codec.compress(x)
    per_img_bytes = [
        sum(len(g[i]) for g in enc["strings"]) for i in range(b)
    ]
    real_bpp = sum(per_img_bytes) * 8 / num_pixels
    rec = codec.decompress(enc["strings"], enc["shape"])
    psnr_real = per_image_psnr(rec["x_hat"], x)

    # --- device-coded path (single-dispatch on-device rANS + sidecar) ---
    codec.autotune_coded(x)
    cenc = codec.compress_coded(x, return_debug=True)
    coded_ok = cenc["format"] == "device-ans"
    coded_bytes = sum(len(s) for s in cenc["strings"][0]) if coded_ok else 0
    coded_bpp = coded_bytes * 8 / num_pixels
    crec = codec.decompress_coded(cenc["strings"], cenc["shape"])
    coded_bit_exact = bool(jnp.all(cenc["y_hat"] == crec["y_hat"]))
    psnr_coded = per_image_psnr(crec["x_hat"], x)

    gap = abs(real_bpp - est_bpp) / max(est_bpp, 1e-9)
    gap_bypass = abs(real_bpp - est_bpp_bypass) / max(est_bpp_bypass, 1e-9)
    gap_table = abs(real_bpp - est_bpp_table) / max(est_bpp_table, 1e-9)
    return {
        "images": int(b),
        "resolution": [H, W],
        "estimated_bpp": round(est_bpp, 5),
        "estimated_bpp_bypass_aware": round(est_bpp_bypass, 5),
        "estimated_bpp_table_aware": round(est_bpp_table, 5),
        "real_codec_bpp": round(real_bpp, 5),
        "real_codec_bpp_spread": spread(
            [v * 8 / (H * W) for v in per_img_bytes]
        ),
        "estimate_vs_real_gap": round(gap, 5),
        "estimate_vs_real_gap_bypass_aware": round(gap_bypass, 5),
        "estimate_vs_real_gap_table_aware": round(gap_table, 5),
        # correctness criterion: real bytes must track the rate the
        # integer tables imply; the continuous->table delta is a known
        # modeling trade shared with the reference, reported above
        "gap_ok_lt_2pct": bool(gap_table < 0.02),
        "psnr_forward": round(float(psnr_fwd.mean()), 3),
        "psnr_real_codec": round(float(psnr_real.mean()), 3),
        "psnr_real_codec_spread": spread(psnr_real),
        "device_coded": {
            "format": cenc["format"],
            "bpp": round(coded_bpp, 5),
            "bit_exact_vs_encoder": coded_bit_exact,
            "psnr": round(float(psnr_coded.mean()), 3),
        },
    }


def eval_ind(args, x):
    from train_flagship import load_params_npz

    from resdsic_tpu.models import ResWACNNIndependentEntropy, ScalableCodec

    lmbdas = tuple(args.lambda_list)
    # auto-detect the dual-decoder configuration from the artifact
    md = any("g_s_multi" in k for k in np.load(args.npz).files)
    model = ResWACNNIndependentEntropy(
        lmbda_list=lmbdas, mask_policy=args.mask_policy,
        multiple_decoder=md,
    )
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    params = load_params_npz(args.npz, params)
    b = x.shape[0]
    num_pixels = b * H * W

    codec = ScalableCodec(model, params)
    codec.update()
    tb = table_bits_fn()
    fwd = jax.jit(
        lambda p, xx, q: model.apply(p, xx, quality=q, training=False),
        static_argnums=(2,),
    )

    levels = {}
    for qi, lm in enumerate(lmbdas):
        # --- forward estimates at this single level ---
        out = fwd(params, x, (qi,))
        lik = out["likelihoods"]
        bits_z = float(jnp.sum(jnp.minimum(-jnp.log2(lik["z"]), 16.0)))
        est_base = float(
            jnp.sum(jnp.minimum(-jnp.log2(lik["y"]), 16.0))
        ) + bits_z
        est_prog = 0.0
        if qi != 0 and "y_prog" in lik:
            est_prog = float(
                jnp.sum(jnp.minimum(-jnp.log2(lik["y_prog"]), 16.0))
            ) + float(jnp.sum(jnp.minimum(-jnp.log2(lik["z_prog"]), 16.0)))

        # --- real-codec byte split (ref step.py:271-291) ---
        enc = codec.compress(x, quality=qi)
        s = enc["strings"]
        base_bytes = sum(len(v) for v in s[0]) + sum(len(v) for v in s[1])
        prog_bytes = 0
        if qi != 0 and len(s) > 2:
            prog_bytes = sum(len(v) for v in s[2]) + sum(
                len(v) for group in s[3] for v in (
                    group if isinstance(group, (list, tuple)) else [group]
                )
            )
        rec = codec.decompress(enc["strings"], enc["shape"], quality=qi)
        psnr_real = per_image_psnr(rec["x_hat"], x)

        # --- table-aware estimate (device symbol planes) ---
        q_norm = codec._normalize_quality(qi)
        enc_dev = codec._encode_scal_fn(codec.params, x, q=q_norm)
        est_table = float(
            tb(enc_dev["y_symbols"], enc_dev["y_indexes"])
        ) + bits_z
        if qi != 0 and "y_prog_symbols" in enc_dev:
            est_table += float(
                tb(enc_dev["y_prog_symbols"], enc_dev["y_prog_indexes"])
            ) + float(jnp.sum(jnp.minimum(-jnp.log2(lik["z_prog"]), 16.0)))

        # --- device-coded single-blob path ---
        codec.autotune_coded(x, quality=qi)
        cenc = codec.compress_coded(x, quality=qi, return_debug=True)
        coded_ok = cenc["format"] == "device-ans"
        coded_bpp = (
            sum(len(v) for v in cenc["strings"][0]) * 8 / num_pixels
            if coded_ok else None
        )
        crec = codec.decompress_coded(
            cenc["strings"], cenc["shape"], quality=qi
        )
        bit_exact = bool(jnp.all(cenc["y_hat"] == crec["y_hat"]))

        real_bpp = (base_bytes + prog_bytes) * 8 / num_pixels
        est_bpp = (est_base + est_prog) / num_pixels
        gap_table = abs(real_bpp - est_table / num_pixels) / max(
            est_table / num_pixels, 1e-9
        )
        levels[f"level_{qi}_lmbda_{lm}"] = {
            "bpp_base": round(base_bytes * 8 / num_pixels, 5),
            "bpp_prog": round(prog_bytes * 8 / num_pixels, 5),
            "bpp_total": round(real_bpp, 5),
            "estimated_bpp_bypass_aware": round(est_bpp / 1.0, 5),
            "estimated_bpp_table_aware": round(est_table / num_pixels, 5),
            "estimate_vs_real_gap_table_aware": round(gap_table, 5),
            "gap_ok_lt_2pct": bool(gap_table < 0.02),
            "psnr_real_codec": round(float(psnr_real.mean()), 3),
            "psnr_real_codec_spread": spread(psnr_real),
            "device_coded": {
                "format": cenc["format"],
                "bpp": round(coded_bpp, 5) if coded_bpp else None,
                "bit_exact_vs_encoder": bit_exact,
            },
        }
        print(f"level {qi} (λ={lm}): {levels[f'level_{qi}_lmbda_{lm}']}",
              flush=True)
    return {
        "images": int(b),
        "resolution": [H, W],
        "model": "ind",
        "lambda_list": list(lmbdas),
        "mask_policy": args.mask_policy,
        "levels": levels,
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--npz", default=str(REPO / "artifacts" / "cnn_trained_bf16.npz"),
        help="trained-params artifact (tools/train_flagship.py)",
    )
    ap.add_argument(
        "--tag", default="lmbda_0.025",
        help="RD-point key in the RD file (points merge across runs)",
    )
    ap.add_argument("--model", default="cnn", choices=("cnn", "ind", "tcm"))
    ap.add_argument("--lambda-list", type=float, nargs="+",
                    default=[0.0035, 0.065])
    ap.add_argument("--mask-policy", default="two-levels")
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument("--rd-file", default=str(REPO / "docs" / "RD_r5.json"))
    args = ap.parse_args()

    if not Path(args.npz).exists():
        print("no trained artifact; run tools/train_flagship.py first",
              file=sys.stderr)
        sys.exit(1)

    print(f"devices: {jax.devices()}", flush=True)
    x = jnp.asarray(eval_images(args.images))

    result = eval_ind(args, x) if args.model == "ind" else eval_cnn(args, x)
    result["anchors_kodak_cnn"] = ANCHORS
    result["note"] = NOTE
    print(json.dumps(result, indent=2))
    (REPO / "artifacts").mkdir(exist_ok=True)
    (REPO / "artifacts" / "rd_point.json").write_text(
        json.dumps(result, indent=2)
    )
    point = {
        k: v for k, v in result.items()
        if k not in ("anchors_kodak_cnn", "note")
    }
    merge_rd(Path(args.rd_file), args.tag, point, NOTE)


if __name__ == "__main__":
    main()
