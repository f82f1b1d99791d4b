import numpy as np
import pytest

from resdsic_tpu.coding import (
    BufferedRansEncoder,
    CdfTable,
    RansDecoder,
    RansEncoder,
    pmf_to_quantized_cdf,
    pmf_to_quantized_cdf_batch,
)


def _gaussian_table(scales, max_len=64, tail_mass=1e-9):
    """Build a CdfTable of discretized zero-mean gaussians (like GC.update)."""
    from scipy.stats import norm

    scales = np.asarray(scales, dtype=np.float64)
    multiplier = -norm.ppf(tail_mass / 2)
    pmf_center = np.ceil(scales * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    L = int(pmf_length.max())
    samples = np.abs(np.arange(L)[None, :] - pmf_center[:, None]).astype(np.float64)
    upper = norm.cdf((0.5 - samples) / scales[:, None])
    lower = norm.cdf((-0.5 - samples) / scales[:, None])
    pmf = (upper - lower).astype(np.float32)
    tail = (2 * lower[:, :1]).astype(np.float32).ravel()
    table = pmf_to_quantized_cdf_batch(pmf, tail, pmf_length)
    return CdfTable(table.cdf, table.cdf_length, -pmf_center)


def test_pmf_to_quantized_cdf_basic():
    pmf = np.array([0.25, 0.5, 0.2, 0.05], dtype=np.float32)
    cdf = pmf_to_quantized_cdf(pmf, 16)
    assert cdf[0] == 0
    assert cdf[-1] == 1 << 16
    assert np.all(np.diff(cdf) >= 1)  # de-zeroed
    # rough proportionality
    freqs = np.diff(cdf) / (1 << 16)
    np.testing.assert_allclose(freqs, pmf, atol=0.01)


def test_pmf_to_quantized_cdf_dezeros_tiny_bins():
    pmf = np.array([0.999999, 1e-12, 1e-12], dtype=np.float32)
    cdf = pmf_to_quantized_cdf(pmf, 16)
    assert np.all(np.diff(cdf) >= 1)
    assert cdf[-1] == 1 << 16


def test_pmf_rejects_bad_input():
    with pytest.raises(ValueError):
        pmf_to_quantized_cdf(np.array([-0.1, 1.1], dtype=np.float32))
    with pytest.raises(ValueError):
        pmf_to_quantized_cdf(np.array([0.0, 0.0], dtype=np.float32))


def test_roundtrip_simple():
    table = _gaussian_table([0.5, 1.0, 4.0, 32.0])
    rng = np.random.default_rng(0)
    n = 10000
    indexes = rng.integers(0, 4, n).astype(np.int32)
    scales = np.array([0.5, 1.0, 4.0, 32.0])[indexes]
    symbols = np.round(rng.normal(0, scales)).astype(np.int32)

    enc = RansEncoder()
    stream = enc.encode_with_indexes(symbols, indexes, table)
    dec = RansDecoder()
    out = dec.decode_with_indexes(stream, indexes, table)
    np.testing.assert_array_equal(out, symbols)


def test_roundtrip_with_escapes():
    """Out-of-range symbols exercise the bypass path."""
    table = _gaussian_table([0.2, 1.0])
    rng = np.random.default_rng(1)
    n = 5000
    indexes = rng.integers(0, 2, n).astype(np.int32)
    symbols = rng.integers(-1000, 1000, n).astype(np.int32)
    # sprinkle extreme values
    symbols[::97] = 10**6
    symbols[::101] = -(10**6)

    enc = RansEncoder()
    stream = enc.encode_with_indexes(symbols, indexes, table)
    out = RansDecoder().decode_with_indexes(stream, indexes, table)
    np.testing.assert_array_equal(out, symbols)


def test_buffered_encoder_multi_put_equals_single_stream():
    """Buffered puts across slices then one flush == decode in same order."""
    table = _gaussian_table([0.5, 2.0, 8.0])
    rng = np.random.default_rng(2)
    chunks = []
    enc = BufferedRansEncoder()
    for _ in range(10):
        idx = rng.integers(0, 3, 500).astype(np.int32)
        sym = np.round(rng.normal(0, 3, 500)).astype(np.int32)
        enc.encode_with_indexes(sym, idx, table)
        chunks.append((sym, idx))
    stream = enc.flush()

    dec = RansDecoder()
    dec.set_stream(stream)
    for sym, idx in chunks:
        out = dec.decode_stream(idx, table)
        np.testing.assert_array_equal(out, sym)


def test_compression_ratio_sane():
    """Low-entropy data must compress well below 16 bits/symbol."""
    table = _gaussian_table([0.15])
    n = 50000
    rng = np.random.default_rng(3)
    symbols = np.round(rng.normal(0, 0.15, n)).astype(np.int32)
    indexes = np.zeros(n, dtype=np.int32)
    stream = RansEncoder().encode_with_indexes(symbols, indexes, table)
    bits_per_symbol = len(stream) * 8 / n
    # entropy of round(N(0, 0.15)) is well under 0.2 bits
    assert bits_per_symbol < 0.25, bits_per_symbol


def test_compression_ratio_matches_entropy():
    """Rate should be within a few percent of the discrete entropy."""
    table = _gaussian_table([2.0])
    n = 100000
    rng = np.random.default_rng(4)
    symbols = np.round(rng.normal(0, 2.0, n)).astype(np.int32)
    indexes = np.zeros(n, dtype=np.int32)
    stream = RansEncoder().encode_with_indexes(symbols, indexes, table)
    bits_per_symbol = len(stream) * 8 / n

    vals, counts = np.unique(symbols, return_counts=True)
    p = counts / n
    entropy = -(p * np.log2(p)).sum()
    assert bits_per_symbol < entropy * 1.03 + 0.05, (bits_per_symbol, entropy)


def test_empty_flush():
    enc = BufferedRansEncoder()
    stream = enc.flush()
    assert len(stream) == 8  # just the flushed state


# ---------------------------------------------------------------------------
# Range coder ("rangecoder" registry entry, ref src/compress/__init__.py:22-62)
# ---------------------------------------------------------------------------

from resdsic_tpu.coding import (  # noqa: E402
    BufferedRangeEncoder,
    RangeDecoder,
    RangeEncoder,
    coder_classes,
)


def test_rangecoder_roundtrip_simple():
    table = _gaussian_table([0.5, 1.0, 4.0, 32.0])
    rng = np.random.default_rng(0)
    n = 10000
    indexes = rng.integers(0, 4, n).astype(np.int32)
    scales = np.array([0.5, 1.0, 4.0, 32.0])[indexes]
    symbols = np.round(rng.normal(0, scales)).astype(np.int32)

    stream = RangeEncoder().encode_with_indexes(symbols, indexes, table)
    out = RangeDecoder().decode_with_indexes(stream, indexes, table)
    np.testing.assert_array_equal(out, symbols)


def test_rangecoder_roundtrip_with_escapes():
    table = _gaussian_table([0.2, 1.0])
    rng = np.random.default_rng(1)
    n = 5000
    indexes = rng.integers(0, 2, n).astype(np.int32)
    symbols = rng.integers(-1000, 1000, n).astype(np.int32)
    symbols[::97] = 10**6
    symbols[::101] = -(10**6)

    stream = RangeEncoder().encode_with_indexes(symbols, indexes, table)
    out = RangeDecoder().decode_with_indexes(stream, indexes, table)
    np.testing.assert_array_equal(out, symbols)


def test_rangecoder_buffered_multi_put_stream():
    table = _gaussian_table([0.5, 2.0, 8.0])
    rng = np.random.default_rng(2)
    chunks = []
    enc = BufferedRangeEncoder()
    for _ in range(10):
        idx = rng.integers(0, 3, 500).astype(np.int32)
        sym = np.round(rng.normal(0, 3, 500)).astype(np.int32)
        enc.encode_with_indexes(sym, idx, table)
        chunks.append((sym, idx))
    stream = enc.flush()

    dec = RangeDecoder()
    dec.set_stream(stream)
    for sym, idx in chunks:
        out = dec.decode_stream(idx, table)
        np.testing.assert_array_equal(out, sym)


def test_rangecoder_rate_close_to_ans():
    """Both coders approach the entropy; sizes within a few percent."""
    table = _gaussian_table([1.0])
    rng = np.random.default_rng(3)
    symbols = np.round(rng.normal(0, 1.0, 20000)).astype(np.int32)
    indexes = np.zeros(20000, dtype=np.int32)
    ans_len = len(RansEncoder().encode_with_indexes(symbols, indexes, table))
    rc_len = len(RangeEncoder().encode_with_indexes(symbols, indexes, table))
    assert abs(rc_len - ans_len) / ans_len < 0.05


def test_entropy_coder_registry():
    import resdsic_tpu as pkg

    assert set(pkg.available_entropy_coders()) == {"ans", "rangecoder"}
    assert pkg.get_entropy_coder() == "ans"
    assert coder_classes("rangecoder") == (
        RangeEncoder, RangeDecoder, BufferedRangeEncoder
    )
    pkg.set_entropy_coder("rangecoder")
    try:
        assert coder_classes()[0] is RangeEncoder
    finally:
        pkg.set_entropy_coder("ans")
    with pytest.raises(ValueError):
        pkg.set_entropy_coder("huffman")
