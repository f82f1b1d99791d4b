"""Byte-level budget of the device-coded container vs the host coder.

VERDICT r4 weak #2: device-coded bpp 0.766 vs host 0.658 (~16%). This tool
attributes every byte of the per-image blob (header, caps, states, counts,
words, sidecar) and compares the word payload against the host coder's
y+z stream bytes on the SAME images/weights, so the overhead decomposes
into (a) container framing, (b) sidecar volume, (c) in-stream coding
excess (split re-quantization + lane padding + escape tail mass).

Runs on CPU by default (the TPU may be busy training):
    JAX_PLATFORMS=cpu PYTHONPATH=.:tools python tools/rate_budget.py
"""

from __future__ import annotations

import argparse
import json
import struct
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from resdsic_tpu.models import WACNN  # noqa: E402
from resdsic_tpu.models.codec import WACNNCodec, _BLOB_HEADER  # noqa: E402
from resdsic_tpu.utils.checkpoint import load_params_npz  # noqa: E402


def decompose_blob(blob: bytes) -> dict:
    from resdsic_tpu.models.codec import _parse_counts

    hs = _BLOB_HEADER.size
    magic, ver, flags, _, lanes, capv, q = _BLOB_HEADER.unpack(blob[:hs])
    off = hs
    caps_b = 0
    if ver == 4 or (ver == 6 and flags & 8):
        (ncaps,) = struct.unpack_from("<H", blob, off)
        caps_b = 2 + 2 * ncaps
        off += caps_b
    if ver == 6 and flags & 128:  # tight lane header (states + counts)
        from resdsic_tpu.models.codec import _parse_lane_header

        (_, counts), nread = _parse_lane_header(blob, off, lanes)
        # attribute: lo16 raw = "states", the rest of the block = "counts"
        states_b = 2 * lanes
        counts_b = nread - states_b
        off += nread
    else:
        states_b = 4 * lanes
        off += states_b
        if ver == 6 and flags & 32:
            counts, counts_b = _parse_counts(blob, off, lanes)
        else:
            counts = np.frombuffer(blob, "<u2", lanes, offset=off)
            counts_b = 2 * lanes
        off += counts_b
    words_b = 2 * int(counts.sum())
    off += words_b
    sidecar_b = len(blob) - off
    n_sc = 0
    if flags & 4:
        (n_sc,) = struct.unpack_from("<I", blob, off)
    return {
        "ver": ver,
        "header": hs,
        "caps": caps_b,
        "states": states_b,
        "counts": counts_b,
        "words": words_b,
        "sidecar": sidecar_b,
        "n_sidecar_entries": n_sc,
        "total": len(blob),
        "counts_arr": counts,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default="artifacts_committed/cnn_q65_bf16.npz")
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--lanes", type=int, default=512)
    ap.add_argument("--max-frac", type=float, default=0.5,
                    help="split_cap_max_frac (1.0 = uncapped value planes)")
    ap.add_argument("--cap-quantile", type=float, default=0.999)
    ap.add_argument("--legacy-container", action="store_true",
                    help="v3/v4 writer (no packed counts / Rice sidecar)")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    from eval_trained import eval_images

    model = WACNN()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    params = load_params_npz(args.npz, params)
    x = jnp.asarray(eval_images(args.images))
    b, h, w, _ = x.shape
    px = b * h * w

    codec = WACNNCodec(model, params)
    codec.update()

    # host-coder truth
    out_h = codec.compress(x)
    y_bytes = sum(len(s) for s in out_h["strings"][0])
    z_bytes = sum(len(s) for s in out_h["strings"][1])
    host_bpp = (y_bytes + z_bytes) * 8 / px

    # device-coded per-image blobs, bench config
    codec.coded_lanes = args.lanes
    codec.coded_batch_container = False
    codec.split_cap_max_frac = args.max_frac
    codec.split_cap_quantile = args.cap_quantile
    if args.legacy_container:
        codec.container_packed_counts = False
        codec.container_rice_sidecar = False
    tune = codec.autotune_coded(x)
    out_c = codec.compress_coded(x)
    assert out_c["format"] == "device-ans", out_c["format"]

    cats = {
        k: 0
        for k in ("header", "caps", "states", "counts", "words", "sidecar")
    }
    n_sc = 0
    for blob in out_c["strings"][0]:
        d = decompose_blob(blob)
        for k in cats:
            cats[k] += d[k]
        n_sc += d["n_sidecar_entries"]
    total = sum(cats.values())

    rep = {
        "images": b,
        "resolution": [h, w],
        "lanes": args.lanes,
        "autotune": {
            "split": bool(tune["coded_split"]),
            "cap_frac": tune["split_cap_frac"]
            if not isinstance(tune["split_cap_frac"], tuple)
            else list(tune["split_cap_frac"]),
        },
        "host_bpp": round(host_bpp, 5),
        "host_y_bpp": round(y_bytes * 8 / px, 5),
        "host_z_bpp": round(z_bytes * 8 / px, 5),
        "device_bpp": round(total * 8 / px, 5),
        "overhead_pct": round(100 * (total * 8 / px / host_bpp - 1), 2),
        "category_bpp": {
            k: round(v * 8 / px, 5) for k, v in cats.items()
        },
        "sidecar_entries_per_image": n_sc / b,
        "word_excess_vs_host_bpp": round(
            (cats["words"] - (y_bytes + z_bytes)) * 8 / px, 5
        ),
    }
    print(json.dumps(rep, indent=2, default=str))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(rep, indent=2, default=str))


if __name__ == "__main__":
    main()
