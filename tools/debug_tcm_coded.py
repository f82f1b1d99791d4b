"""Reproduce and localize the TCM coded-path desync on real TPU.

The coded enc/dec programs recompute mu/scale/rows from z_hat in two
separately compiled XLA programs; any ulp divergence desyncs the rANS
stream (drained check trips). The host path's fused/stepped programs now
agree bit-exactly on TPU (deterministic Pallas islands) — this tool runs
the CODED path and reports, per slice, whether the decoded y_hat matches
the encoder's, which localizes the first diverging plane:

  * garbage-scale diff at slice i  -> stream desync began at/by slice i
    (rows/bins divergence between the two programs)
  * tiny ulp diff only             -> mu divergence with intact stream

Usage:
  python tools/debug_tcm_coded.py --model tcm --size full --hw 256x256
  python tools/debug_tcm_coded.py --model tcm --size small --hw 128x128
  python tools/debug_tcm_coded.py --split off --sidecar 0
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time
import warnings

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tcm", choices=["tcm", "cnn"])
    ap.add_argument("--size", default="full", choices=["full", "small"])
    ap.add_argument("--hw", default="256x256")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--split", default="auto", choices=["auto", "on", "off"])
    ap.add_argument("--sidecar", type=int, default=None)
    ap.add_argument("--host-check", action="store_true",
                    help="also run the host-path selftest as a control")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from resdsic_tpu.models import TCM, WACNN
    from resdsic_tpu.models.codec import WACNNCodec

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.model == "tcm":
        if args.size == "small":
            m = TCM(
                N=32, M=64, num_slices=2, max_support_slices=1,
                config=(1, 1, 1, 1, 1, 1), head_dim=(8, 8, 8, 8, 8, 8),
                window_size=4, hyper_ch=48, dtype=dt,
            )
        else:
            m = TCM(dtype=dt)
    else:
        m = WACNN(dtype=dt) if args.size == "full" else WACNN(
            N=64, M=128, num_slices=4, max_support_slices=2, dtype=dt
        )

    h, w = (int(v) for v in args.hw.split("x"))
    t0 = time.time()
    p = jax.jit(m.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, h, w, 3), jnp.float32),
    )
    print(f"# init {time.time()-t0:.1f}s  backend={jax.default_backend()}")

    c = WACNNCodec(m, p)
    c.update()
    c.on_coding_loss = "warn"
    c.decode_check = False
    if args.split != "auto":
        c.coded_split = args.split == "on"
    if args.sidecar is not None:
        c.sidecar_cap = args.sidecar
    print(f"# split={c.coded_split} sidecar={c.sidecar_cap} "
          f"lanes={c.coded_lanes} interleave={c.coded_interleave}")

    x = jax.random.uniform(jax.random.key(3), (args.batch, h, w, 3), jnp.float32)

    if args.host_check:
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            c.selftest(x, require_stream_equality=False)
        print(f"# host-path selftest OK ({time.time()-t0:.1f}s)")

    t0 = time.time()
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        out = c.compress_coded(x, return_debug=True)
    for wmsg in wlist:
        print(f"# warn: {wmsg.message}")
    print(f"# compress_coded {time.time()-t0:.1f}s format={out.get('format')}")
    if out.get("format") == "host":
        print("RESULT: fell back to host coder (coding loss) — nothing to bisect")
        return

    t0 = time.time()
    rec = c.decompress_coded(out["strings"], out["shape"])
    print(f"# decompress_coded {time.time()-t0:.1f}s")

    ye = np.asarray(out["y_hat"], dtype=np.float32)
    yd = np.asarray(rec["y_hat"], dtype=np.float32)
    sc = m.slice_ch
    ns = m.num_slices
    print(f"# y_hat shape {ye.shape}, {ns} slices x {sc} ch")
    first_bad = None
    for i in range(ns):
        a = ye[..., i * sc : (i + 1) * sc]
        b = yd[..., i * sc : (i + 1) * sc]
        d = np.abs(a - b)
        nbad = int((d > 0).sum())
        if nbad and first_bad is None:
            first_bad = i
        print(f"slice {i}: max|diff|={d.max():.6g}  n_diff={nbad}/{d.size}")
    if first_bad is None:
        print("RESULT: coded roundtrip BIT-EXACT (no desync at this config)")
    else:
        print(f"RESULT: first diverging slice = {first_bad}")


if __name__ == "__main__":
    main()
