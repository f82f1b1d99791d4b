"""Freeze reference-pipeline rANS vectors into tests/golden/ (VERDICT r4 #3).

Runs the REFERENCE's torch WACNN (built from /root/reference/src through
the parity-test compressai stubs) on our committed trained weights,
recording every entropy-coder call exactly as the reference makes it
(entropy_models.py:229-285 call-site semantics): per-image
(symbols, indexes, cdfs, cdf_lengths, offsets, stream-bytes) for the EB z
stream and the 10-slice buffered GC y stream, plus the reference-side
integer CDF tables themselves.

tests/test_golden_streams.py then replays these WITHOUT torch installed:
byte-identical re-encode, exact decode, and (slow) equality of our
entropy/tables.py integer tables against the frozen torch-derived ones.

Run: PYTHONPATH=.:tests:tools python tools/make_golden_streams.py
Writes tests/golden/ref_streams.npz (committed).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
for p in ("tools", "tests", ""):
    sys.path.insert(0, str(REPO / p))

N_IMAGES = 2
HW = 256


def main():
    import torch

    from ab_reference import build_inverse_state_dict
    from eval_trained import eval_images
    from test_torch_parity import REF, _install_stubs
    from train_flagship import load_params_npz

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from resdsic_tpu.models import WACNN

    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import compressai.ans as stub_ans
    from compress.models import WACNN as RefWACNN

    # record every coder call the reference makes
    records = []

    class RecBuffered(stub_ans.BufferedRansEncoder):
        def __init__(self):
            super().__init__()
            self._calls = []

        def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths,
                                offsets):
            self._calls.append((list(symbols), list(indexes), cdfs,
                                cdf_lengths, offsets))
            super().encode_with_indexes(symbols, indexes, cdfs, cdf_lengths,
                                        offsets)

        def flush(self):
            data = super().flush()
            records.append(("buffered_y", self._calls, bytes(data)))
            return data

    class RecEncoder(stub_ans.RansEncoder):
        def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths,
                                offsets):
            data = super().encode_with_indexes(symbols, indexes, cdfs,
                                               cdf_lengths, offsets)
            records.append((
                "single_z",
                [(list(symbols), list(indexes), cdfs, cdf_lengths, offsets)],
                bytes(data),
            ))
            return data

    stub_ans.BufferedRansEncoder = RecBuffered
    stub_ans.RansEncoder = RecEncoder
    # the reference binds the coder classes at EntropyModel construction
    # via compress.entropy_models._EntropyCoder — patch there too
    import compress.entropy_models.entropy_models as ref_em

    ref_em.BufferedRansEncoder = RecBuffered
    ref_em.RansEncoder = RecEncoder
    # cnn.py constructs BufferedRansEncoder directly (cnn.py:237) and bound
    # the name at ITS import time — patch that module binding too
    ref_cnn = sys.modules[RefWACNN.__module__]
    ref_cnn.BufferedRansEncoder = RecBuffered

    # our committed weights -> reference torch model
    model = WACNN()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    params = load_params_npz(
        str(REPO / "artifacts_committed" / "cnn_q65_bf16.npz"), params
    )
    tm = RefWACNN(N=192, M=320)
    sd, _ = build_inverse_state_dict(tm, params["params"])
    tm.load_state_dict(sd, strict=False)
    tm.update(force=True)
    tm.eval()

    imgs = eval_images(N_IMAGES)[:, :HW, :HW]
    out = {}
    for i in range(N_IMAGES):
        records.clear()
        xt = torch.from_numpy(
            np.ascontiguousarray(imgs[i].transpose(2, 0, 1))[None]
        )
        with torch.no_grad():
            enc = tm.compress(xt)
            rec = tm.decompress(enc["strings"], enc["shape"])
        mse = float(((rec["x_hat"] - xt) ** 2).mean())
        psnr = -10 * np.log10(mse)
        print(f"image {i}: {len(records)} coder calls, psnr {psnr:.2f}")
        kinds = [r[0] for r in records]
        assert kinds.count("single_z") >= 1 and kinds.count("buffered_y") >= 1
        for kind, calls, data in records:
            if kind == "buffered_y":
                # the reference extends one symbol list across all 10
                # slices then encodes once (cnn.py:270-272)
                assert len(calls) == 1
            sym, idx, cdfs, lens, offs = calls[0]
            tag = f"img{i}_{kind}"
            out[f"{tag}/symbols"] = np.asarray(sym, np.int32)
            out[f"{tag}/indexes"] = np.asarray(idx, np.int32)
            out[f"{tag}/cdf"] = np.asarray(cdfs, np.int32)
            out[f"{tag}/cdf_length"] = np.asarray(lens, np.int32)
            out[f"{tag}/offset"] = np.asarray(offs, np.int32)
            out[f"{tag}/stream"] = np.frombuffer(data, np.uint8)
        out[f"img{i}/psnr"] = np.float64(psnr)
        out[f"img{i}/bpp"] = np.float64(
            sum(len(s[0]) for s in enc["strings"]) * 8 / (HW * HW)
        )
        out[f"img{i}/pixels"] = imgs[i]

    # reference-side integer tables (torch-built, zoo-checkpoint pathway)
    out["tables/gc_cdf"] = tm.gaussian_conditional._quantized_cdf.numpy()
    out["tables/gc_cdf_length"] = (
        tm.gaussian_conditional._cdf_length.numpy()
    )
    out["tables/gc_offset"] = tm.gaussian_conditional._offset.numpy()
    out["tables/gc_scale_table"] = np.asarray(
        tm.gaussian_conditional.scale_table, np.float64
    )
    out["tables/eb_cdf"] = tm.entropy_bottleneck._quantized_cdf.numpy()
    out["tables/eb_cdf_length"] = tm.entropy_bottleneck._cdf_length.numpy()
    out["tables/eb_offset"] = tm.entropy_bottleneck._offset.numpy()

    dest = REPO / "tests" / "golden"
    dest.mkdir(exist_ok=True)
    np.savez_compressed(dest / "ref_streams.npz", **out)
    size = (dest / "ref_streams.npz").stat().st_size
    print(f"wrote tests/golden/ref_streams.npz ({size/1024:.0f} KB)")


if __name__ == "__main__":
    main()
