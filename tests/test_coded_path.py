"""Fully-fused on-device-coded codec paths (compress_coded/decompress_coded).

The coded path must (a) roundtrip bit-exactly — the decoder's y_hat equals
the encoder's own reconstruction — and (b) produce rates comparable to the
host-coder path on the same content (same integer CDFs; the coded path
loses only the per-row escape reserve).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resdsic_tpu.models import WACNN, WACNNCodec


@pytest.fixture(scope="module")
def codec():
    m = WACNN(N=32, M=64, num_slices=2, max_support_slices=1)
    p = jax.jit(m.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    c = WACNNCodec(m, p)
    c.update()
    # untrained weights clamp a handful of symbols to the CDF support;
    # these tests exercise the device blob format itself, so keep the
    # round-2 "warn" policy — the loss-policy tests below cover "fallback"
    # and "raise" explicitly.
    c.on_coding_loss = "warn"
    return c


@pytest.fixture(scope="module")
def x():
    return jax.random.uniform(jax.random.key(2), (2, 64, 64, 3), jnp.float32)


def test_coded_roundtrip_bit_exact(codec, x):
    assert codec.selftest_coded(x)


def test_coded_xhat_valid(codec, x):
    out = codec.compress_coded(x)
    assert out["format"] == "device-ans"
    rec = codec.decompress_coded(out["strings"], out["shape"])
    xh = np.asarray(rec["x_hat"])
    assert xh.shape == x.shape
    assert np.all(xh >= 0) and np.all(xh <= 1)
    assert np.all(np.isfinite(xh))


def test_coded_rate_sane_vs_host(codec, x):
    """Same integer tables, so the coded payload must track the host-coder
    stream up to the inherent per-lane cost: each of the L parallel rANS
    lanes starts at the state floor (~2 bytes of unfilled state) where the
    host coder pays it once per stream. At real payloads (>=12 KB/image)
    that bound is <2% overhead."""
    coded = codec.compress_coded(x)
    host = codec.compress(x)
    n = len(coded["strings"][0])
    coded_payload = sum(
        len(s) - 6 * codec.coded_lanes for s in coded["strings"][0]
    )  # v2 lane header: u4 state + u2 count per lane
    host_bytes = sum(len(s) for g in host["strings"] for s in g)
    assert coded_payload < host_bytes * 1.1 + 2 * codec.coded_lanes * n + 64


def test_coded_split_roundtrip_bit_exact(codec, x):
    """Significance-split mode: binary zero/nonzero plane + sparse value
    plane must roundtrip bit-exactly and decode to the same y_hat."""
    codec.coded_split = True
    try:
        assert codec.selftest_coded(x)
    finally:
        codec.coded_split = False


def test_coded_split_rate_close_to_plain(codec, x):
    """The split decomposition p(sym) = p0*[zero] + (1-p0)*p_cond is the
    same model up to conditional-table requantization — total bytes must
    track the plain coded path closely."""
    plain = sum(len(s) for s in codec.compress_coded(x)["strings"][0])
    codec.coded_split = True
    try:
        split = sum(len(s) for s in codec.compress_coded(x)["strings"][0])
    finally:
        codec.coded_split = False
    assert split < plain * 1.08 + 512


@pytest.fixture(scope="module")
def scal_codec():
    from resdsic_tpu.models import ScalableCodec
    from resdsic_tpu.models.scalable import ResWACNNIndependentEntropy

    m = ResWACNNIndependentEntropy(
        N=64, M=64, num_slices=4, max_support_slices=2,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    p = jax.jit(m.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    c = ScalableCodec(m, p)
    c.update()
    c.on_coding_loss = "warn"  # see codec fixture comment
    return c


@pytest.mark.parametrize("quality", [0, 1])
def test_scalable_coded_roundtrip_bit_exact(scal_codec, x, quality):
    assert scal_codec.selftest_coded(x, quality=quality)


@pytest.mark.parametrize("quality", [0, 1])
def test_scalable_coded_split_roundtrip(scal_codec, x, quality):
    scal_codec.coded_split = True
    try:
        assert scal_codec.selftest_coded(x, quality=quality)
    finally:
        scal_codec.coded_split = False


def test_scalable_coded_xhat_valid(scal_codec, x):
    out = scal_codec.compress_coded(x, quality=1)
    assert len(out["shape"]) == 2  # base z + prog z spatial shapes
    rec = scal_codec.decompress_coded(out["strings"], out["shape"], quality=1)
    xh = np.asarray(rec["x_hat"])
    assert xh.shape == x.shape
    assert np.all(np.isfinite(xh)) and xh.min() >= 0 and xh.max() <= 1


def test_scalable_coded_q0_smaller_than_q1(scal_codec, x):
    """q=0 omits the progressive planes entirely — fewer bytes."""
    b0 = sum(len(s) for s in scal_codec.compress_coded(x, quality=0)["strings"][0])
    b1 = sum(len(s) for s in scal_codec.compress_coded(x, quality=1)["strings"][0])
    assert b0 < b1


@pytest.mark.slow
def test_icd_coded_roundtrip_with_coding_mask():
    """ScalableICD's coding mask participates in the coded path: masked
    scales drive the row indexes and masked residuals are what's coded —
    the decoder recomputes the identical mask on device."""
    from resdsic_tpu.models import ScalableCodec, ScalableICD

    m = ScalableICD(
        N=64, M=64, num_slices=2, max_support_slices=1,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    p = jax.jit(m.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    c = ScalableCodec(m, p)
    c.update()
    c.on_coding_loss = "warn"
    assert m.uses_coding_mask
    xx = jax.random.uniform(jax.random.key(5), (2, 64, 64, 3), jnp.float32)
    assert c.selftest_coded(xx, quality=1)


def test_coded_encode_shards_over_mesh(codec):
    """Multi-chip serving: the fused coded encoder jits over a data mesh
    with the batch sharded across all 8 virtual devices and produces the
    same header arrays as the single-device program (the rANS lanes are
    per-image, so the scan is embarrassingly data-parallel)."""
    import functools

    from resdsic_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicate,
    )

    mesh = make_mesh(8)
    x8 = jax.random.uniform(jax.random.key(7), (8, 64, 64, 3), jnp.float32)

    ref = codec._encode_coded_fn(
        codec.params, x8, codec.dev_tables, lanes=codec.coded_lanes
    )

    fn = jax.jit(
        functools.partial(
            codec.model.apply, method="encode_coded", lanes=codec.coded_lanes
        ),
        in_shardings=(replicate(mesh), batch_sharding(mesh), replicate(mesh)),
    )
    params_r = jax.device_put(codec.params, replicate(mesh))
    tables_r = jax.device_put(codec.dev_tables, replicate(mesh))
    x_sharded = jax.device_put(x8, batch_sharding(mesh))
    out = fn(params_r, x_sharded, tables_r)

    np.testing.assert_array_equal(
        np.asarray(out["counts"]), np.asarray(ref["counts"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["states"]), np.asarray(ref["states"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["words"]), np.asarray(ref["words"])
    )


@pytest.mark.slow
def test_tcm_coded_roundtrip_bit_exact():
    """The coded programs are inherited by TCM through the same hooks as
    the stepped codec — prove it end to end."""
    from resdsic_tpu.models import TCM

    m = TCM(
        N=32, M=64, num_slices=2, max_support_slices=1,
        config=(1, 1, 1, 1, 1, 1), head_dim=(8, 8, 8, 8, 8, 8),
        window_size=4, hyper_ch=48,
    )
    p = jax.jit(m.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3), jnp.float32),
    )
    c = WACNNCodec(m, p)
    c.update()
    c.on_coding_loss = "warn"
    xx = jax.random.uniform(jax.random.key(3), (1, 128, 128, 3), jnp.float32)
    assert c.selftest_coded(xx)


def test_coded_strings_are_per_image(codec, x):
    """Each image's blob is self-contained: decoding the same blobs in
    swapped order must swap the reconstructions exactly.

    (Decoding at a DIFFERENT batch shape than encoded is deliberately not
    part of the contract: mu/scale are recomputed by both programs, and a
    differently-compiled program may differ by 1 ulp and desync the stream
    — the same same-compilation requirement learned-codec deployments have
    on the reference's torch implementation across devices.)"""
    out = codec.compress_coded(x, return_debug=True)
    rec = codec.decompress_coded(out["strings"], out["shape"])
    swapped = codec.decompress_coded(
        [[out["strings"][0][1], out["strings"][0][0]]], out["shape"]
    )
    np.testing.assert_array_equal(
        np.asarray(swapped["y_hat"][0]), np.asarray(rec["y_hat"][1])
    )
    np.testing.assert_array_equal(
        np.asarray(swapped["y_hat"][1]), np.asarray(rec["y_hat"][0])
    )


# ---------------------------------------------------------------------------
# coding-loss policy + container validation (round-3: VERDICT #3/#4)
# ---------------------------------------------------------------------------


def test_coding_loss_fallback_is_lossless(codec, x):
    """With the sidecar disabled, untrained weights clamp symbols to the
    CDF support; the fallback policy must transparently re-encode via the
    lossless host coder and the roundtrip must be bit-exact INCLUDING the
    outliers the device path would have clamped."""
    codec.on_coding_loss = "fallback"
    codec.sidecar_cap = 0
    try:
        with pytest.warns(RuntimeWarning, match="falling back"):
            out = codec.compress_coded(x, return_debug=True)
        assert out["format"] == "host"
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
    finally:
        codec.on_coding_loss = "warn"
        codec.sidecar_cap = 512


def test_coding_loss_raise(codec, x):
    from resdsic_tpu.models.codec import CodingLossError

    codec.on_coding_loss = "raise"
    codec.sidecar_cap = 0
    try:
        with pytest.raises(CodingLossError, match="clamped"):
            codec.compress_coded(x)
    finally:
        codec.on_coding_loss = "warn"
        codec.sidecar_cap = 512


def test_sidecar_coded_roundtrip_is_lossless(codec, x):
    """The lossless outlier sidecar (default) keeps saturating inputs on
    the device-ans path: every clamped symbol is recovered via the blob's
    sidecar and the roundtrip is bit-exact — the reference achieves the
    same with escape/bypass coding (SURVEY §2.7, rans.cpp:134-152)."""
    import warnings as _w

    enc = codec._encode_coded_fn(
        codec.params, x, codec.dev_tables, lanes=codec.coded_lanes,
        sidecar_cap=512,
    )
    assert int(np.asarray(enc["n_clamped"])) > 0  # saturation engineered
    with _w.catch_warnings():
        _w.simplefilter("error")  # no loss warnings on the sidecar path
        out = codec.compress_coded(x, return_debug=True)
    assert out["format"] == "device-ans"
    rec = codec.decompress_coded(out["strings"], out["shape"])
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
    )


def test_sidecar_overflow_redispatches(codec, x):
    """A sidecar budget below the true outlier count re-dispatches at the
    exact bucketed count and still roundtrips bit-exactly."""
    codec.sidecar_cap = 2
    try:
        with pytest.warns(RuntimeWarning, match="sidecar overflow"):
            out = codec.compress_coded(x, return_debug=True)
        assert out["format"] == "device-ans"
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
    finally:
        codec.sidecar_cap = 512


def test_sidecar_rides_blob(codec, x):
    """Sidecar survives the blob container: parse returns the pairs and a
    truncated sidecar raises."""
    from resdsic_tpu.models.codec import CodedStreamError

    out = codec.compress_coded(x)
    blob = out["strings"][0][0]
    hdr = codec._parse_blob(blob)
    assert hdr["outliers"] is not None
    pos, dval = hdr["outliers"]
    assert len(pos) == len(dval) and len(pos) > 0
    assert np.all(dval != 0)
    with pytest.raises(CodedStreamError, match="sidecar"):
        codec._parse_blob(blob[:-2])


def test_blob_header_roundtrip(codec, x):
    """Device blobs self-describe lanes/split; decode works even when the
    codec's config was changed after encoding."""
    out = codec.compress_coded(x)
    assert out["format"] == "device-ans"
    ref = codec.decompress_coded(out["strings"], out["shape"])
    old = codec.coded_lanes
    codec.coded_lanes = 64  # wrong config; header must win
    try:
        rec = codec.decompress_coded(out["strings"], out["shape"])
    finally:
        codec.coded_lanes = old
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(ref["y_hat"])
    )


def test_blob_header_validation(codec, x):
    from resdsic_tpu.models.codec import CodedStreamError

    out = codec.compress_coded(x)
    blob = out["strings"][0][0]
    bad_magic = b"\x00" + blob[1:]
    with pytest.raises(CodedStreamError, match="magic"):
        codec.decompress_coded([[bad_magic]], out["shape"])
    bad_ver = blob[:1] + b"\x7f" + blob[2:]
    with pytest.raises(CodedStreamError, match="version"):
        codec.decompress_coded([[bad_ver]], out["shape"])
    with pytest.raises(CodedStreamError, match="short|truncated"):
        codec.decompress_coded([[blob[:6]]], out["shape"])


def test_drained_stream_check_catches_corruption(codec, x):
    """Flipping one payload word desyncs the stream; the decoder must
    raise instead of returning corrupt output (drained-stream check)."""
    from resdsic_tpu.models.codec import CodedStreamError

    # sidecar off so the word stream is the blob TAIL regardless of the
    # container version (v6's tight lane header has a variable size)
    sk = codec.sidecar_cap
    codec.sidecar_cap = 0
    try:
        with np.errstate(all="ignore"):
            import warnings as _w

            with _w.catch_warnings():
                _w.simplefilter("ignore")
                out = codec.compress_coded(x)
        blob = bytearray(out["strings"][0][0])
        assert not (blob[2] & 4)  # no sidecar: last u16 IS a payload word
        blob[-2] ^= 0xFF
        with pytest.raises(CodedStreamError, match="drain"):
            codec.decompress_coded([[bytes(blob)]], out["shape"])
    finally:
        codec.sidecar_cap = sk


def test_scalable_quality_from_header(scal_codec, x):
    """decompress_coded with quality=None decodes at the header's q."""
    out = scal_codec.compress_coded(x, quality=1)
    rec = scal_codec.decompress_coded(out["strings"], out["shape"])
    ref = scal_codec.decompress_coded(out["strings"], out["shape"], quality=1)
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(ref["y_hat"])
    )


def test_scalable_quality_mismatch_raises(scal_codec, x):
    from resdsic_tpu.models.codec import CodedStreamError

    out = scal_codec.compress_coded(x, quality=1)
    with pytest.raises(CodedStreamError, match="quality"):
        scal_codec.decompress_coded(out["strings"], out["shape"], quality=0)


def test_coding_loss_fallback_split_mode(codec, x):
    """Significance-split mode with untrained stats can both clamp and
    overflow the per-lane cap; with the sidecar disabled, fallback must
    stay lossless via the host coder."""
    codec.on_coding_loss = "fallback"
    codec.coded_split = True
    codec.sidecar_cap = 0
    try:
        with pytest.warns(RuntimeWarning, match="falling back"):
            out = codec.compress_coded(x, return_debug=True)
        assert out["format"] == "host"
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
    finally:
        codec.coded_split = False
        codec.on_coding_loss = "warn"
        codec.sidecar_cap = 512


def test_sidecar_split_mode_recovers_cap_overflow(codec, x):
    """Split mode's per-lane value-cap coercions are ALSO recovered by the
    sidecar: device-ans format retained, roundtrip bit-exact."""
    import warnings as _w

    codec.coded_split = True
    try:
        with _w.catch_warnings():
            _w.simplefilter("error")
            out = codec.compress_coded(x, return_debug=True)
        assert out["format"] == "device-ans"
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
    finally:
        codec.coded_split = False


def test_point_based_std_raw_quality_at_codec_layer():
    """ADVICE r2: the codec layer must NOT index-normalize quality for
    point-based-std models — extract_mask consumes the raw value as a
    quantile fraction (x0.1). A lambda in lmbda_list would otherwise be
    silently mapped to its level index."""
    from resdsic_tpu.models import ScalableCodec, ScalableICD

    m = ScalableICD(
        N=64, M=64, num_slices=2, max_support_slices=1,
        lmbda_list=(0.0035, 0.065), mask_policy="point-based-std",
    )
    p = jax.jit(m.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    c = ScalableCodec(m, p)
    assert c._normalize_quality(0.065) == 0.065  # raw, not index 1
    assert c._normalize_quality(0) == 0
    # two-levels models keep index semantics
    m2 = ScalableICD(
        N=64, M=64, num_slices=2, max_support_slices=1,
        lmbda_list=(0.0035, 0.065), mask_policy="two-levels",
    )
    c2 = ScalableCodec(m2, p)
    assert c2._normalize_quality(0.065) == 1
    # end-to-end: lambda quality roundtrips bit-exactly through the coded
    # path (encode and decode must derive the identical mask from raw q)
    c.update()
    c.on_coding_loss = "warn"
    xx = jax.random.uniform(jax.random.key(11), (1, 64, 64, 3), jnp.float32)
    assert c.selftest_coded(xx, quality=0.065)


def test_blob_v1_container_still_decodes(codec, x):
    """v2 halves the per-lane count field to u2 and v3 interleaves the
    lane layout; v1 (u4 counts, contiguous layout) containers from
    round-2 encoders must keep decoding bit-identically."""
    import struct

    from resdsic_tpu.models import codec as codec_mod

    codec.coded_interleave = False  # v1 implies the contiguous layout
    try:
        out = codec.compress_coded(x, return_debug=True)
    finally:
        codec.coded_interleave = True
    hs = codec_mod._BLOB_HEADER.size
    v1_strings = []
    for blob in out["strings"][0]:
        hdr = codec._parse_blob(blob)
        flags = (
            (1 if hdr["split"] else 0)
            | (2 if hdr["has_prog"] else 0)
            | (4 if hdr["outliers"] is not None else 0)
        )
        v1 = (
            codec_mod._BLOB_HEADER.pack(
                codec_mod._BLOB_MAGIC, 1, flags, 0, hdr["lanes"],
                hdr["capv"], hdr["q"],
            )
            + hdr["states"].astype("<u4").tobytes()
            + hdr["counts"].astype("<u4").tobytes()
            + hdr["words"].astype("<u2").tobytes()
        )
        if hdr["outliers"] is not None:
            pos, dval = hdr["outliers"]
            v1 += (
                struct.pack("<I", len(pos))
                + pos.astype("<u4").tobytes()
                + dval.astype("<i4").tobytes()
            )
        v1_strings.append(v1)
    rec = codec.decompress_coded([v1_strings], out["shape"])
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
    )


def test_sidecar_pack_roundtrip_with_escapes():
    """The v3 compact sidecar (u16 position diffs + i8 value tokens with
    u4/i4 escapes) must roundtrip exactly, including both escape paths."""
    pos = np.array([5, 6, 70006, 70007, 200000], np.int64)
    dval = np.array([1, -127, 128, -500, 127], np.int64)
    b = WACNNCodec._pack_sidecar(pos, dval)
    assert len(b) < 8 * len(pos)  # beats the raw format
    (p2, d2), nread = WACNNCodec._parse_sidecar(b, 0, len(pos))
    assert nread == len(b)
    np.testing.assert_array_equal(p2, pos.astype(np.int32))
    np.testing.assert_array_equal(d2, dval.astype(np.int32))


def test_blob_v2_contiguous_layout_roundtrip(codec, x):
    """coded_interleave=False (with the v6 rate features off) emits v2
    (contiguous-layout) containers; decode must pick the layout from the
    version byte, not the codec's current config."""
    codec.coded_interleave = False
    codec.container_packed_counts = False
    codec.container_rice_sidecar = False
    codec.container_tight_header = False
    try:
        out = codec.compress_coded(x, return_debug=True)
        assert out["strings"][0][0][1] == 2  # container version byte
    finally:
        codec.coded_interleave = True  # decode under the WRONG config
    try:
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
        # with the rate features off the interleaved path emits v3
        out3 = codec.compress_coded(x)
        assert out3["strings"][0][0][1] == 3
    finally:
        codec.container_packed_counts = True
        codec.container_rice_sidecar = True
        codec.container_tight_header = True
    # the default writer emits v6 (packed counts + Rice sidecar) and the
    # contiguous layout rides flag bit4 instead of the version byte
    out6 = codec.compress_coded(x, return_debug=True)
    blob6 = out6["strings"][0][0]
    assert blob6[1] == 6 and not (blob6[2] & 16)
    codec.coded_interleave = False
    try:
        out6c = codec.compress_coded(x, return_debug=True)
        blob6c = out6c["strings"][0][0]
        assert blob6c[1] == 6 and (blob6c[2] & 16)
    finally:
        codec.coded_interleave = True
    rec6 = codec.decompress_coded(out6c["strings"], out6c["shape"])
    np.testing.assert_array_equal(
        np.asarray(rec6["y_hat"]), np.asarray(out6c["y_hat"])
    )


def test_autotune_coded_from_measured_stats(codec, x):
    """autotune_coded sizes split mode + value-cap from the probe encode's
    measured nonzero rates (VERDICT r2 weak #5: the cap must scale with
    the significance rate, not assume <=50%), and the tuned configuration
    still roundtrips bit-exactly."""
    old = (codec.coded_split, codec.split_cap_frac, codec.coded_word_cap,
           codec.sidecar_cap)
    try:
        stats = codec.autotune_coded(x)
        assert 0.0 <= stats["nonzero_rate_mean"] <= 1.0
        assert stats["nonzero_rate_max"] >= stats["nonzero_rate_mean"]
        assert len(stats["nonzero_rate_per_slice"]) == codec.model.num_slices
        # the decision must follow the measurement: split at sparse MEAN
        # residuals (one dense slice must not disable the mode — the
        # value cap clamps to the in-model T/2 and overflow rides the
        # lossless sidecar), off when the mean itself is dense
        if stats["nonzero_rate_mean"] >= 0.30:
            assert not codec.coded_split
        else:
            assert codec.coded_split
        if codec.coded_split:
            # scalar = uniform budget; tuple = per-slice (container v4)
            fr = codec.split_cap_frac
            fmax = max(fr) if isinstance(fr, tuple) else fr
            assert fmax >= min(0.5, stats["nonzero_rate_max"]) - 1e-9
            assert fmax <= 0.5 + 1e-9
            if isinstance(fr, tuple):
                assert len(fr) == codec.model.num_slices
                assert all(0.05 <= f <= 0.5 for f in fr)
        assert codec.coded_word_cap is None  # cleared; first call re-sizes
        assert codec.sidecar_cap == codec.DEFAULT_SIDECAR_CAP
        assert codec.selftest_coded(x)
    finally:
        (codec.coded_split, codec.split_cap_frac, codec.coded_word_cap,
         codec.sidecar_cap) = old


def test_adaptive_caps_persist(codec, x):
    """Overflow re-dispatches persist the adapted budgets on the codec, so
    steady-state serving is ONE dispatch per direction: the second call
    must not warn again, and both containers decode bit-identically."""
    old = (codec.coded_word_cap, codec.sidecar_cap)
    codec.coded_word_cap = 1  # guaranteed lane overflow
    try:
        with pytest.warns(RuntimeWarning, match="lane overflow"):
            out1 = codec.compress_coded(x, return_debug=True)
        assert codec.coded_word_cap > 1  # persisted from the re-dispatch
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error", RuntimeWarning)
            out2 = codec.compress_coded(x, return_debug=True)
        assert out1["strings"][0] == out2["strings"][0]
        rec = codec.decompress_coded(out2["strings"], out2["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out2["y_hat"])
        )
    finally:
        codec.coded_word_cap, codec.sidecar_cap = old


def test_sidecar_cap_persists_after_overflow(codec, x):
    """Sidecar overflow re-dispatch persists the bucketed budget too."""
    old = codec.sidecar_cap
    codec.sidecar_cap = 2
    try:
        with pytest.warns(RuntimeWarning, match="sidecar overflow"):
            codec.compress_coded(x)
        assert codec.sidecar_cap > 2
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error", RuntimeWarning)
            codec.compress_coded(x)  # no second overflow warning
    finally:
        codec.sidecar_cap = old


def test_autotune_coded_scalable(scal_codec, x):
    """Scalable autotune probes base+progressive planes at a quality."""
    old = (scal_codec.coded_split, scal_codec.split_cap_frac,
           scal_codec.coded_word_cap, scal_codec.sidecar_cap)
    try:
        stats = scal_codec.autotune_coded(x, quality=1)
        # base + progressive planes both measured
        assert (
            len(stats["nonzero_rate_per_slice"])
            == 2 * scal_codec.model.num_slices
        )
        assert scal_codec.selftest_coded(x, quality=1)
    finally:
        (scal_codec.coded_split, scal_codec.split_cap_frac,
         scal_codec.coded_word_cap, scal_codec.sidecar_cap) = old


def test_per_plane_caps_v4_roundtrip(codec, x):
    """Per-slice value caps emit a v4 container: caps ride the header
    block, decode self-configures from them (even after the codec's own
    fracs change), and the reconstruction is bit-exact vs the encoder."""
    codec.coded_split = True
    codec.split_cap_frac = (0.45, 0.20)  # one budget per slice (ns=2)
    codec.container_packed_counts = False
    codec.container_rice_sidecar = False
    codec.container_tight_header = False
    try:
        out = codec.compress_coded(x, return_debug=True)
        assert out["format"] == "device-ans"
        blob = out["strings"][0][0]
        assert blob[1] == 4  # container version byte
        hdr = codec._parse_blob(blob)
        assert isinstance(hdr["capv"], tuple) and len(hdr["capv"]) == 2
        assert hdr["interleave"]
        codec.split_cap_frac = 0.5  # decode must use the header's caps
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
    finally:
        codec.coded_split = False
        codec.split_cap_frac = 0.5
        codec.container_packed_counts = True
        codec.container_rice_sidecar = True
        codec.container_tight_header = True


def test_per_plane_caps_v4_scalable(scal_codec, x):
    """The scalable family shares one per-slice budget between y and
    y_prog planes of the same index; v4 blobs roundtrip bit-exactly."""
    scal_codec.coded_split = True
    scal_codec.split_cap_frac = (0.40, 0.15, 0.30, 0.10)
    scal_codec.container_packed_counts = False
    scal_codec.container_rice_sidecar = False
    scal_codec.container_tight_header = False
    try:
        out = scal_codec.compress_coded(x, quality=1, return_debug=True)
        if out["format"] != "device-ans":
            import pytest

            pytest.skip("loss fallback engaged on this init")
        assert out["strings"][0][0][1] == 4
        rec = scal_codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
    finally:
        scal_codec.coded_split = False
        scal_codec.split_cap_frac = 0.5
        scal_codec.container_packed_counts = True
        scal_codec.container_rice_sidecar = True
        scal_codec.container_tight_header = True


def test_split_capv_tunable_roundtrip(codec, x):
    """split_cap_frac tunes the value-plane budget; capv rides the blob
    header so decode self-configures even if the codec's frac changed."""
    codec.coded_split = True
    codec.split_cap_frac = 0.25
    try:
        out = codec.compress_coded(x, return_debug=True)
        assert out["format"] == "device-ans"
        codec.split_cap_frac = 0.5  # decode must use the header's capv
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
    finally:
        codec.coded_split = False
        codec.split_cap_frac = 0.5


# ---------------------------------------------------------------------------
# batch container (v5) — one blob per batch for serving
# ---------------------------------------------------------------------------


def test_batch_container_roundtrip_bit_exact(codec, x):
    """v5 batch mode emits ONE blob for the whole batch; the blob is
    byte-equivalent in content to the per-image v3 blobs (same states/
    counts/words) and decodes to the identical y_hat."""
    out_per = codec.compress_coded(x, return_debug=True)
    codec.coded_batch_container = True
    try:
        out = codec.compress_coded(x, return_debug=True)
    finally:
        codec.coded_batch_container = False
    assert len(out["strings"][0]) == 1
    blob = out["strings"][0][0]
    assert blob[1] == 5  # version byte
    # batch container must be smaller than the per-image blobs combined
    assert len(blob) < sum(len(s) for s in out_per["strings"][0])
    rec = codec.decompress_coded(out["strings"], out["shape"])
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
    )


def test_batch_container_split_with_caps(codec, x):
    """v5 carries the per-plane caps block (flags bit3) and the split
    flag; decode self-configures from the header even after the codec's
    own tuning changes."""
    codec.coded_batch_container = True
    codec.coded_split = True
    codec.split_cap_frac = (0.45, 0.20)
    try:
        out = codec.compress_coded(x, return_debug=True)
        assert len(out["strings"][0]) == 1
        assert out["strings"][0][0][1] == 5
        hdr = codec._parse_batch_blob(out["strings"][0][0])
        assert hdr["split"] and isinstance(hdr["capv"], tuple)
        assert hdr["batch"] == x.shape[0]
        codec.split_cap_frac = 0.5
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
    finally:
        codec.coded_batch_container = False
        codec.coded_split = False
        codec.split_cap_frac = 0.5


def test_batch_container_sidecar_lossless(codec, x):
    """The batch container's per-image sidecar sections recover outliers
    losslessly, matching the per-image-blob reconstruction exactly."""
    codec.coded_batch_container = True
    try:
        out = codec.compress_coded(x, return_debug=True)
        hdr = codec._parse_batch_blob(out["strings"][0][0])
        rec = codec.decompress_coded(out["strings"], out["shape"])
    finally:
        codec.coded_batch_container = False
    out_per = codec.compress_coded(x, return_debug=True)
    rec_per = codec.decompress_coded(out_per["strings"], out_per["shape"])
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(rec_per["y_hat"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["y_hat"]), np.asarray(rec["y_hat"])
    )


def test_batch_container_validation(codec, x):
    """Truncation and misuse raise CodedStreamError instead of desyncing."""
    from resdsic_tpu.models.codec import CodedStreamError

    codec.coded_batch_container = True
    try:
        out = codec.compress_coded(x)
    finally:
        codec.coded_batch_container = False
    blob = out["strings"][0][0]
    with pytest.raises(CodedStreamError, match="truncated"):
        codec._parse_batch_blob(blob[: len(blob) // 2])
    # a v5 blob passed alongside others hits the per-image parser
    with pytest.raises(CodedStreamError, match="batch"):
        codec.decompress_coded([[blob, blob]], out["shape"])


def test_batch_container_scalable(scal_codec, x):
    """Scalable family: one v5 blob carries the whole batch including the
    progressive planes (has_prog flag + header quality)."""
    scal_codec.coded_batch_container = True
    try:
        out = scal_codec.compress_coded(x, quality=1, return_debug=True)
        if out["format"] != "device-ans":
            pytest.skip("loss fallback engaged on this init")
        assert len(out["strings"][0]) == 1
        hdr = scal_codec._parse_batch_blob(out["strings"][0][0])
        assert hdr["has_prog"] and hdr["q"] == 1
        rec = scal_codec.decompress_coded(out["strings"], out["shape"])
    finally:
        scal_codec.coded_batch_container = False
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
    )


def test_coded_serving_on_mesh_bit_exact(codec):
    """Driver-level mesh serving (VERDICT r3 missing #6): place_on_mesh
    shards compress_coded/decompress_coded over the 8-device data mesh;
    the emitted blobs are BIT-EXACT vs single-device serving and the
    decode reproduces the encoder's reconstruction."""
    from resdsic_tpu.parallel.mesh import make_mesh

    x8 = jax.random.uniform(jax.random.key(11), (8, 64, 64, 3), jnp.float32)

    # single-device ground truth
    ref = codec.compress_coded(x8, return_debug=True)
    assert ref["format"] == "device-ans"

    mesh = make_mesh(8)
    codec.place_on_mesh(mesh)
    try:
        out = codec.compress_coded(x8, return_debug=True)
        assert out["format"] == "device-ans"
        assert [bytes(b) for b in out["strings"][0]] == [
            bytes(b) for b in ref["strings"][0]
        ], "mesh-sharded blobs differ from single-device blobs"
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
        xh = np.asarray(rec["x_hat"])
        assert xh.shape == x8.shape
    finally:
        codec.serve_mesh = None


def test_coded_serving_on_mesh_scalable(scal_codec):
    """The scalable blob path serves over the mesh too (both quality
    levels; q=1 carries the progressive planes + prog sidecar)."""
    from resdsic_tpu.parallel.mesh import make_mesh

    x8 = jax.random.uniform(jax.random.key(12), (8, 64, 64, 3), jnp.float32)
    ref0 = scal_codec.compress_coded(x8, quality=0, return_debug=True)
    ref1 = scal_codec.compress_coded(x8, quality=1, return_debug=True)

    mesh = make_mesh(8)
    scal_codec.place_on_mesh(mesh)
    try:
        for q, ref in ((0, ref0), (1, ref1)):
            out = scal_codec.compress_coded(x8, quality=q, return_debug=True)
            assert [bytes(b) for b in out["strings"][0]] == [
                bytes(b) for b in ref["strings"][0]
            ], f"q={q}: mesh blobs differ"
            rec = scal_codec.decompress_coded(
                out["strings"], out["shape"], quality=q
            )
            np.testing.assert_array_equal(
                np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
            )
    finally:
        scal_codec.serve_mesh = None


# ---------------------------------------------------------------------------
# container v6: width-packed counts + Golomb-Rice sidecar (rate features)
# ---------------------------------------------------------------------------


def test_rice_sidecar_codec_roundtrip():
    """The Rice sidecar codec is exact for clustered, uniform, escaped
    (huge-gap / huge-delta) and empty inputs."""
    from resdsic_tpu.models.codec import (
        _rice_decode_sidecar,
        _rice_encode_sidecar,
    )

    rng = np.random.default_rng(0)
    cases = []
    # clustered gaps, small deltas (the measured trained-model shape)
    pos = np.cumsum(rng.geometric(1 / 18, 500)).astype(np.int64)
    dv = rng.choice([-2, -1, 1, 2], 500).astype(np.int64)
    cases.append((pos, dv))
    # sparse huge gaps + large deltas (escape paths)
    pos = np.cumsum(rng.integers(1, 3_000_000, 20)).astype(np.int64)
    dv = rng.integers(-50_000, 50_000, 20).astype(np.int64)
    cases.append((pos, dv))
    # single entry at zero
    cases.append((np.array([0], np.int64), np.array([7], np.int64)))
    # empty
    cases.append((np.zeros(0, np.int64), np.zeros(0, np.int64)))
    for pos, dv in cases:
        blob = b"\xaa" + _rice_encode_sidecar(pos, dv) + b"\xbb" * 3
        (p2, d2), nread = _rice_decode_sidecar(blob, 1, len(pos))
        assert nread <= len(blob) - 1
        np.testing.assert_array_equal(p2, pos.astype(np.int32))
        np.testing.assert_array_equal(d2, dv.astype(np.int32))


def test_rice_sidecar_smaller_than_v3():
    """At the measured trained-model statistics (clustered gaps, +/-1-2
    deltas) the Rice sidecar beats the v3 escape-coded one by >2x."""
    from resdsic_tpu.models.codec import WACNNCodec, _rice_encode_sidecar

    rng = np.random.default_rng(1)
    pos = np.cumsum(rng.geometric(1 / 18, 1000)).astype(np.int64)
    dv = rng.choice([-2, -1, 1, 2], 1000, p=[0.15, 0.4, 0.33, 0.12]).astype(
        np.int64
    )
    v6 = _rice_encode_sidecar(pos, dv)
    v3 = WACNNCodec._pack_sidecar(pos, dv)
    assert len(v6) * 2 < len(v3)


def test_packed_counts_roundtrip():
    from resdsic_tpu.models.codec import _pack_counts, _parse_counts

    rng = np.random.default_rng(2)
    for counts in (
        rng.integers(25, 45, 512),
        np.full(64, 31),
        np.zeros(16, np.int64),
        rng.integers(0, 60000, 128),
        np.array([7], np.int64),
    ):
        blob = b"Z" + _pack_counts(counts) + b"tail"
        dec, nread = _parse_counts(blob, 1, len(counts))
        assert nread <= len(blob) - 5
        np.testing.assert_array_equal(dec, np.asarray(counts, np.int64))


def test_blob_v6_roundtrip_and_smaller(codec, x):
    """The default v6 writer roundtrips bit-exactly and its container is
    strictly smaller than the v3 form of the same payload."""
    out6 = codec.compress_coded(x, return_debug=True)
    blob6 = out6["strings"][0][0]
    assert blob6[1] == 6 and (blob6[2] & (32 | 128))
    codec.container_packed_counts = False
    codec.container_rice_sidecar = False
    try:
        out3 = codec.compress_coded(x, return_debug=True)
    finally:
        codec.container_packed_counts = True
        codec.container_rice_sidecar = True
    assert sum(len(s) for s in out6["strings"][0]) < sum(
        len(s) for s in out3["strings"][0]
    )
    rec = codec.decompress_coded(out6["strings"], out6["shape"])
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out6["y_hat"])
    )


def test_split_cap_frac_above_half(codec, x):
    """split_cap_max_frac > 0.5 budgets value planes beyond T/2 — dense
    lanes code fully in-stream (v6 caps block carries the explicit caps)
    and the roundtrip stays bit-exact."""
    codec.coded_split = True
    codec.split_cap_frac = (0.85, 0.7)
    try:
        out = codec.compress_coded(x, return_debug=True)
        blob = out["strings"][0][0]
        assert blob[1] == 6 and (blob[2] & 8)
        hdr = codec._parse_blob(blob)
        assert isinstance(hdr["capv"], tuple)
        n_y = (x.shape[1] // 16) * (x.shape[2] // 16) * codec.model.slice_ch
        ts = -(-n_y // codec.coded_lanes)
        assert hdr["capv"][0] > ts // 2  # genuinely above the old limit
        rec = codec.decompress_coded(out["strings"], out["shape"])
        np.testing.assert_array_equal(
            np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
        )
    finally:
        codec.coded_split = False
        codec.split_cap_frac = 0.5


def test_batch_container_v6_flags(codec, x):
    """v5 batch containers carry the packed-counts / Rice-sidecar flag
    bits and decode bit-exactly."""
    codec.coded_batch_container = True
    try:
        out = codec.compress_coded(x, return_debug=True)
    finally:
        codec.coded_batch_container = False
    blob = out["strings"][0][0]
    assert blob[1] == 5 and (blob[2] & (32 | 128))
    rec = codec.decompress_coded(out["strings"], out["shape"])
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out["y_hat"])
    )


def test_tight_lane_header_roundtrip():
    """The v6 bit7 lane header (rANS state hi-bytes + Rice count
    deviations) is exact over adversarial state/count distributions."""
    from resdsic_tpu.models.codec import (
        _pack_lane_header,
        _parse_lane_header,
    )

    rng = np.random.default_rng(3)
    cases = [
        # realistic: log-uniform states, binomial counts
        (np.uint32((2.0 ** rng.uniform(16, 32, 512)).astype(np.int64)),
         rng.binomial(3000, 0.01, 512)),
        # all states at the floor / all counts equal
        (np.full(64, 1 << 16, np.uint32), np.full(64, 7, np.int64)),
        # extremes: states near 2^32-1, counts with huge outliers
        (np.uint32([1 << 16, (1 << 32) - 1, 1 << 24, (1 << 24) - 1]),
         np.int64([0, 60000, 3, 3])),
        # single lane
        (np.uint32([123456789]), np.int64([42])),
    ]
    for states, counts in cases:
        blob = b"HDR" + _pack_lane_header(states, counts) + b"tail"
        (s2, c2), nread = _parse_lane_header(blob, 3, len(states))
        assert nread == len(blob) - 7
        np.testing.assert_array_equal(s2, states)
        np.testing.assert_array_equal(c2, counts)


def test_tight_lane_header_smaller_than_raw():
    """At realistic statistics the tight header beats the raw 6 B/lane
    (u32 state + u16 count) block."""
    from resdsic_tpu.models.codec import _pack_lane_header

    rng = np.random.default_rng(4)
    states = np.uint32((2.0 ** rng.uniform(16, 32, 4096)).astype(np.int64))
    counts = rng.binomial(3000, 0.01, 4096)
    blob = _pack_lane_header(states, counts)
    assert len(blob) < 6 * 4096 * 0.78  # >22% below raw


def test_blob_v6_tight_header_bit_exact(codec, x):
    """End-to-end with bit7 on (the default): roundtrip bit-exact, and
    the container shrinks vs the bit5 width-packed form."""
    out_t = codec.compress_coded(x, return_debug=True)
    blob = out_t["strings"][0][0]
    assert blob[1] == 6 and (blob[2] & 128)
    codec.container_tight_header = False
    try:
        out_w = codec.compress_coded(x, return_debug=True)
    finally:
        codec.container_tight_header = True
    assert sum(len(s) for s in out_t["strings"][0]) < sum(
        len(s) for s in out_w["strings"][0]
    )
    rec = codec.decompress_coded(out_t["strings"], out_t["shape"])
    np.testing.assert_array_equal(
        np.asarray(rec["y_hat"]), np.asarray(out_t["y_hat"])
    )
