"""In-environment A/B vs the reference (VERDICT r3 next #3a).

Loads OUR trained flagship checkpoint into the REFERENCE's torch WACNN
(built from /root/reference/src, read-only, with the same compressai
stubs the parity tests install — the reference pipeline then runs
end-to-end through our native rANS), runs the reference's own
compress/decompress over the shared eval set, and compares bpp/PSNR
against our codec on the same images with the same weights.

The torch-side state dict is produced by INVERTING utils/torch_convert.py
empirically: each reference state-dict key is converted alone through the
forward converter to discover its Flax path, and the value transform is
identified by matching the converted tensor against the candidate
transforms (conv HWIO, deconv flip, linear transpose, identity) — so the
inverse can never drift from the forward mapping.

Run: PYTHONPATH=/root/.axon_site:.:tests python tools/ab_reference.py \
       --npz artifacts_committed/cnn_q65_bf16.npz --images 24
Writes artifacts/ab_reference.json (docs/AB_r4.md quotes it).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO))

H, W = 768, 512


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _candidates():
    """(name, forward, inverse) value transforms torch_convert applies."""
    ident = lambda a: a
    conv_f = lambda a: np.transpose(a, (2, 3, 1, 0))
    conv_i = lambda a: np.ascontiguousarray(np.transpose(a, (3, 2, 0, 1)))
    dec_f = lambda a: np.transpose(a[:, :, ::-1, ::-1], (2, 3, 0, 1))
    dec_i = lambda a: np.ascontiguousarray(
        np.transpose(a, (2, 3, 0, 1))[:, :, ::-1, ::-1]
    )
    lin_f = lambda a: a.T
    lin_i = lambda a: np.ascontiguousarray(a.T)
    return [
        ("identity", ident, ident),
        ("conv", conv_f, conv_i),
        ("deconv", dec_f, dec_i),
        ("linear", lin_f, lin_i),
    ]


def build_inverse_state_dict(torch_model, flax_params):
    """torch state dict carrying flax_params' values (see module doc)."""
    import torch

    from resdsic_tpu.utils.torch_convert import convert_wacnn_state_dict

    flat = _flatten(flax_params)
    sd = {}
    unmapped = []
    for key, val in torch_model.state_dict().items():
        v = val.detach().cpu().numpy()
        if v.dtype not in (np.float32, np.float64):
            continue  # integer buffers (CDFs, indexes) — rebuilt by update()
        probe = convert_wacnn_state_dict({key: v})
        leaves = _flatten(probe)
        if not leaves:
            continue  # converter skips this key (rebuilt buffers)
        assert len(leaves) == 1, (key, list(leaves))
        (path, conv_v), = leaves.items()
        if path not in flat:
            # GDN reparam pedestal / lower-bound constants etc.: fixed
            # buffers identical on both sides by construction — skip
            assert key.endswith((".pedestal", ".bound")), (
                f"unexpected unmapped reference key {key}"
            )
            unmapped.append(key)
            continue
        ours = flat[path].astype(np.float32)
        chosen = None
        for name, fwd, inv in _candidates():
            try:
                if fwd(v).shape == conv_v.shape and np.allclose(
                    fwd(v), conv_v, atol=0
                ):
                    chosen = (name, inv)
                    break
            except Exception:  # wrong rank for this transform — not it
                continue
        assert chosen is not None, f"no transform matched for {key}"
        sd[key] = torch.from_numpy(chosen[1](ours).copy())
    return sd, unmapped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--npz",
        default=str(REPO / "artifacts_committed" / "cnn_q65_bf16.npz"),
    )
    ap.add_argument("--images", type=int, default=24)
    ap.add_argument(
        "--side", default="both", choices=("torch", "ours", "both"),
        help="run one side only; results merge into "
        "artifacts/ab_reference.json so the CPU torch pass can overlap "
        "TPU work",
    )
    args = ap.parse_args()

    import os

    if args.side == "torch":
        # torch-only pass must not open a second client to the tunneled
        # TPU (it may be busy training); params load fine on CPU
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    if args.side == "torch":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import torch

    from eval_trained import eval_images, per_image_psnr
    from test_torch_parity import REF, _install_stubs
    from train_flagship import load_params_npz

    from resdsic_tpu.models import WACNN, WACNNCodec

    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from compress.models import WACNN as RefWACNN

    # ---- shared weights ----
    model = WACNN()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    params = load_params_npz(args.npz, params)

    imgs = eval_images(args.images)
    num_pixels = H * W
    out_path = REPO / "artifacts" / "ab_reference.json"
    result = {"npz": args.npz, "images": int(len(imgs))}
    if out_path.exists():
        try:
            prev = json.loads(out_path.read_text())
            if prev.get("npz") == args.npz and prev.get(
                "images"
            ) == len(imgs):
                result = prev  # merge sides across runs
        except ValueError:
            pass

    # ---- reference pipeline (torch, through our native rANS stubs) ----
    if args.side in ("torch", "both"):
        torch.manual_seed(0)
        tm = RefWACNN(N=192, M=320)
        sd, unmapped = build_inverse_state_dict(tm, params["params"])
        # the reference's CompressionModel.load_state_dict override
        # returns None; missing keys are the CDF buffers update() rebuilds
        # below and the constant reparam buffers in `unmapped`
        tm.load_state_dict(sd, strict=False)
        print(f"torch side: {len(sd)} tensors loaded, "
              f"{len(unmapped)} constant buffers skipped", flush=True)
        tm.eval()
        tm.update(force=True)

        ref_bpp, ref_psnr = [], []
        t0 = time.time()
        for i, im in enumerate(imgs):
            x_t = torch.from_numpy(im.transpose(2, 0, 1)[None].copy())
            with torch.no_grad():
                out = tm.compress(x_t)
                dec = tm.decompress(out["strings"], out["shape"])
            nbytes = sum(
                len(s) for grp in out["strings"]
                for s in (grp if isinstance(grp, (list, tuple)) else [grp])
            )
            ref_bpp.append(nbytes * 8 / num_pixels)
            x_hat = dec["x_hat"].clamp(0, 1).numpy()[0].transpose(1, 2, 0)
            mse = float(np.mean((x_hat - im) ** 2))
            ref_psnr.append(-10 * np.log10(mse))
            print(f"ref img {i}: bpp {ref_bpp[-1]:.4f} "
                  f"psnr {ref_psnr[-1]:.2f} ({time.time()-t0:.0f}s)",
                  flush=True)
        result["reference_torch"] = {
            "bpp": [round(v, 5) for v in ref_bpp],
            "psnr": [round(v, 3) for v in ref_psnr],
            "bpp_mean": round(float(np.mean(ref_bpp)), 5),
            "psnr_mean": round(float(np.mean(ref_psnr)), 3),
        }

    # ---- ours (same weights, same images) ----
    if args.side in ("ours", "both"):
        codec = WACNNCodec(model, params)
        codec.update()
        x = jnp.asarray(imgs)
        enc = codec.compress(x)
        per_img_bytes = [
            sum(len(g[i]) for g in enc["strings"]) for i in range(len(imgs))
        ]
        rec = codec.decompress(enc["strings"], enc["shape"])
        our_psnr = per_image_psnr(rec["x_hat"], x)
        result["ours"] = {
            "bpp": [round(v * 8 / num_pixels, 5) for v in per_img_bytes],
            "psnr": [round(float(v), 3) for v in our_psnr],
            "bpp_mean": round(
                float(np.mean([v * 8 / num_pixels for v in per_img_bytes])),
                5,
            ),
            "psnr_mean": round(float(np.mean(our_psnr)), 3),
        }

    if "reference_torch" in result and "ours" in result:
        r, o = result["reference_torch"], result["ours"]
        result["delta"] = {
            "bpp_mean": round(o["bpp_mean"] - r["bpp_mean"], 5),
            "psnr_mean": round(o["psnr_mean"] - r["psnr_mean"], 3),
            "bpp_max_abs": round(float(np.max(np.abs(
                np.asarray(o["bpp"]) - np.asarray(r["bpp"])
            ))), 5),
            "psnr_max_abs": round(float(np.max(np.abs(
                np.asarray(o["psnr"]) - np.asarray(r["psnr"])
            ))), 3),
        }
    print(json.dumps(result, indent=2))
    (REPO / "artifacts").mkdir(exist_ok=True)
    out_path.write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
