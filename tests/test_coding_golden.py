"""Golden-vector validation of the native rANS runtime and CDF quantizer.

The oracle here is an INDEPENDENT pure-Python implementation of the publicly
specified algorithms the reference's `compressai.ans` / `compressai._CXX`
extensions implement (SURVEY.md §2.7):

  * rans64: 64-bit-state rANS with 32-bit-word renormalization, LIFO encode,
    flush = two little-endian 32-bit state words at the stream head
    (public-domain ryg_rans `rans64.h`, vendored by the reference at
    src/third_party/ryg_rans/rans64.h).
  * CompressAI stream layer: 16-bit-precision CDF rows; per-symbol
    value = symbol - offset[index]; out-of-range values escape through the
    final CDF bin then bypass-code the folded remainder (neg -> -2v-1,
    else 2*(v-max)) in 4-bit chunks with a base-15 unary chunk-count prefix.
  * pmf_to_quantized_cdf: float32 round to 1<<precision, exact-integer
    rescale by the total, cumulative sum, force cdf[-1]=1<<precision, then
    de-zero empty bins by stealing mass from the SMALLEST bin with freq > 1
    (ryg_rans `normalize_freqs`, ported by CompressAI; note SURVEY.md:225
    says "largest" — that is an error in the survey, see docs/PARITY.md).

If our C++ runtime produces byte-identical streams and tables to this
oracle, it is format-compatible with CompressAI-generated bitstreams.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from resdsic_tpu import coding

PRECISION = 16
RANS64_L = 1 << 31
BYPASS_PRECISION = 4
MAX_BYPASS_VAL = (1 << BYPASS_PRECISION) - 1


# ---------------------------------------------------------------------------
# Oracle: CDF quantizer
# ---------------------------------------------------------------------------

def oracle_pmf_to_quantized_cdf(pmf, precision=PRECISION):
    pmf32 = np.asarray(pmf, dtype=np.float32)
    scaled = np.round(pmf32 * np.float32(1 << precision)).astype(np.int64)
    total = int(scaled.sum())
    assert total > 0
    freqs = ((1 << precision) * scaled) // total
    cdf = [0] + list(np.cumsum(freqs))
    cdf[-1] = 1 << precision
    n = len(pmf32)
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            best_freq, best_steal = None, -1
            for j in range(n):
                freq = cdf[j + 1] - cdf[j]
                if freq > 1 and (best_freq is None or freq < best_freq):
                    best_freq, best_steal = freq, j
            assert best_steal != -1
            if best_steal < i:
                for j in range(best_steal + 1, i + 1):
                    cdf[j] -= 1
            else:
                for j in range(i + 1, best_steal + 1):
                    cdf[j] += 1
    return [int(v) for v in cdf]


# ---------------------------------------------------------------------------
# Oracle: rans64 encoder/decoder with CompressAI escape/bypass layer
# ---------------------------------------------------------------------------

def _fold(value, max_value):
    """(value, raw_val) after escape folding."""
    if value < 0:
        return max_value, -2 * value - 1
    if value >= max_value:
        return max_value, 2 * (value - max_value)
    return value, None


def oracle_encode(symbols, indexes, cdfs, cdf_lengths, offsets):
    syms = []  # (start_or_val, range, bypass)
    for s, idx in zip(symbols, indexes):
        cdf = cdfs[idx]
        max_value = cdf_lengths[idx] - 2
        value, raw_val = _fold(int(s) - int(offsets[idx]), max_value)
        syms.append((cdf[value], cdf[value + 1] - cdf[value], False))
        if value == max_value:
            n_bypass = 0
            while (raw_val >> (n_bypass * BYPASS_PRECISION)) != 0:
                n_bypass += 1
            val = n_bypass
            while val >= MAX_BYPASS_VAL:
                syms.append((MAX_BYPASS_VAL, 0, True))
                val -= MAX_BYPASS_VAL
            syms.append((val, 0, True))
            for j in range(n_bypass):
                syms.append(
                    ((raw_val >> (j * BYPASS_PRECISION)) & MAX_BYPASS_VAL, 0, True)
                )

    words = []  # renorm words in emission order (written back-to-front)
    x = RANS64_L
    for start, rng, bypass in reversed(syms):
        if bypass:
            freq = 1 << (PRECISION - BYPASS_PRECISION)
            if x >= ((RANS64_L >> PRECISION) << 32) * freq:
                words.append(x & 0xFFFFFFFF)
                x >>= 32
            x = (x << BYPASS_PRECISION) | start
        else:
            if x >= ((RANS64_L >> PRECISION) << 32) * rng:
                words.append(x & 0xFFFFFFFF)
                x >>= 32
            x = ((x // rng) << PRECISION) + (x % rng) + start
    head = [x & 0xFFFFFFFF, (x >> 32) & 0xFFFFFFFF]
    out_words = head + list(reversed(words))
    return b"".join(struct.pack("<I", w) for w in out_words)


def oracle_decode(data, indexes, cdfs, cdf_lengths, offsets):
    n_words = (len(data) + 3) // 4
    padded = data + b"\0" * (n_words * 4 - len(data))
    words = list(struct.unpack(f"<{n_words}I", padded))
    x = words[0] | (words[1] << 32)
    pos = 2

    def renorm(x, pos):
        if x < RANS64_L and pos < len(words):
            x = (x << 32) | words[pos]
            pos += 1
        return x, pos

    def get_bits(x, pos, nbits):
        val = x & ((1 << nbits) - 1)
        x >>= nbits
        x, pos = renorm(x, pos)
        return val, x, pos

    out = []
    for idx in indexes:
        cdf = cdfs[idx]
        length = cdf_lengths[idx]
        max_value = length - 2
        cum = x & ((1 << PRECISION) - 1)
        value = 0
        while value + 1 < length and cdf[value + 1] <= cum:
            value += 1
        start, freq = cdf[value], cdf[value + 1] - cdf[value]
        x = freq * (x >> PRECISION) + cum - start
        x, pos = renorm(x, pos)
        if value == max_value:
            val, x, pos = get_bits(x, pos, BYPASS_PRECISION)
            n_bypass = val
            while val == MAX_BYPASS_VAL:
                val, x, pos = get_bits(x, pos, BYPASS_PRECISION)
                n_bypass += val
            raw_val = 0
            for j in range(n_bypass):
                val, x, pos = get_bits(x, pos, BYPASS_PRECISION)
                raw_val |= val << (j * BYPASS_PRECISION)
            value = raw_val >> 1
            if raw_val & 1:
                value = -value - 1
            else:
                value += max_value
        out.append(value + int(offsets[idx]))
    return out


# ---------------------------------------------------------------------------
# CDF quantizer golden vectors
# ---------------------------------------------------------------------------

def test_cdf_hand_vector_simple():
    # round(0.5*65536)=32768 etc.; total exactly 65536 -> identity rescale
    assert list(coding.pmf_to_quantized_cdf([0.5, 0.25, 0.25])) == [
        0, 32768, 49152, 65536,
    ]


def test_cdf_hand_vector_dezero_steals_from_smallest():
    # zero middle bin; both neighbors have freq 32768, first minimum (j=0)
    # is stolen from: cdf[1] decremented.
    assert list(coding.pmf_to_quantized_cdf([0.5, 0.0, 0.5])) == [
        0, 32767, 32768, 65536,
    ]


def test_cdf_hand_vector_steal_direction_right():
    # zero FIRST bin: smallest freq>1 bin is to the right -> increments
    assert list(coding.pmf_to_quantized_cdf([0.0, 0.5, 0.5])) == [
        0, 1, 32768, 65536,
    ]


@pytest.mark.parametrize("seed", range(8))
def test_cdf_matches_oracle_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 70))
    pmf = rng.gamma(0.3, 1.0, n).astype(np.float32)
    pmf /= pmf.sum()
    # inject hard zeros sometimes
    if seed % 2:
        pmf[rng.integers(0, n, max(1, n // 5))] = 0.0
        s = pmf.sum()
        assert s > 0
        pmf = pmf / s
    got = list(coding.pmf_to_quantized_cdf(pmf))
    want = oracle_pmf_to_quantized_cdf(pmf)
    assert got == want


def test_cdf_batch_matches_single():
    rng = np.random.default_rng(0)
    rows, max_len = 5, 20
    pmfs = rng.gamma(0.5, 1.0, (rows, max_len)).astype(np.float32)
    lens = rng.integers(3, max_len + 1, rows).astype(np.int32)
    tail = rng.uniform(1e-9, 1e-3, rows).astype(np.float32)
    table = coding.pmf_to_quantized_cdf_batch(pmfs, tail, lens)
    for r in range(rows):
        prob = np.concatenate([pmfs[r, : lens[r]], [tail[r]]])
        want = oracle_pmf_to_quantized_cdf(prob)
        assert list(table.cdf[r, : lens[r] + 2]) == want


# ---------------------------------------------------------------------------
# Bitstream golden vectors
# ---------------------------------------------------------------------------

def _random_case(seed, n_symbols=400, with_escapes=True):
    rng = np.random.default_rng(seed)
    ncdfs = int(rng.integers(2, 8))
    cdfs, lengths, offsets = [], [], []
    max_len = 0
    for _ in range(ncdfs):
        pmf_len = int(rng.integers(3, 40))
        pmf = rng.gamma(0.4, 1.0, pmf_len).astype(np.float32)
        pmf /= pmf.sum() * 1.01  # leave tail mass
        tail = 1.0 - pmf.sum()
        cdf = oracle_pmf_to_quantized_cdf(np.concatenate([pmf, [tail]]))
        cdfs.append(cdf)
        lengths.append(pmf_len + 2)
        offsets.append(int(rng.integers(-20, 5)))
        max_len = max(max_len, pmf_len + 2)
    cdf_mat = np.zeros((ncdfs, max_len), np.int32)
    for i, c in enumerate(cdfs):
        cdf_mat[i, : len(c)] = c
    table = coding.CdfTable(
        cdf=cdf_mat, cdf_length=np.array(lengths, np.int32),
        offset=np.array(offsets, np.int32),
    )
    indexes = rng.integers(0, ncdfs, n_symbols).astype(np.int32)
    symbols = np.empty(n_symbols, np.int32)
    for i, idx in enumerate(indexes):
        max_value = lengths[idx] - 2
        if with_escapes and rng.random() < 0.05:
            symbols[i] = offsets[idx] + int(rng.integers(-4000, 4000))
        else:
            symbols[i] = offsets[idx] + int(rng.integers(0, max_value))
    return symbols, indexes, cdfs, lengths, offsets, table


@pytest.mark.parametrize("seed", range(6))
def test_stream_bytes_match_oracle(seed):
    symbols, indexes, cdfs, lengths, offsets, table = _random_case(seed)
    want = oracle_encode(symbols, indexes, cdfs, lengths, offsets)
    got = coding.RansEncoder().encode_with_indexes(symbols, indexes, table)
    assert got == want, f"stream bytes differ (len {len(got)} vs {len(want)})"

    buf = coding.BufferedRansEncoder()
    buf.encode_with_indexes(symbols[:137], indexes[:137], table)
    buf.encode_with_indexes(symbols[137:], indexes[137:], table)
    assert buf.flush() == want  # buffering must not change the stream


@pytest.mark.parametrize("seed", range(3))
def test_decoder_reads_oracle_stream(seed):
    symbols, indexes, cdfs, lengths, offsets, table = _random_case(seed + 100)
    data = oracle_encode(symbols, indexes, cdfs, lengths, offsets)
    got = coding.RansDecoder().decode_with_indexes(data, indexes, table)
    np.testing.assert_array_equal(got, symbols)


@pytest.mark.parametrize("seed", range(3))
def test_oracle_reads_our_stream(seed):
    symbols, indexes, cdfs, lengths, offsets, table = _random_case(seed + 200)
    data = coding.RansEncoder().encode_with_indexes(symbols, indexes, table)
    got = oracle_decode(data, indexes, cdfs, lengths, offsets)
    np.testing.assert_array_equal(got, symbols)


def test_extreme_escape_values():
    # huge folded remainders exercise multi-chunk bypass + unary prefix > 15
    cdf = oracle_pmf_to_quantized_cdf([0.9, 0.05, 0.05])
    table = coding.CdfTable(
        cdf=np.array([cdf], np.int32), cdf_length=np.array([3], np.int32),
        offset=np.array([0], np.int32),
    )
    symbols = np.array([0, 1 << 20, -(1 << 20), 0, 123456, -99999], np.int32)
    indexes = np.zeros(len(symbols), np.int32)
    want = oracle_encode(symbols, indexes, [cdf], [3], [0])
    got = coding.RansEncoder().encode_with_indexes(symbols, indexes, table)
    assert got == want
    back = coding.RansDecoder().decode_with_indexes(want, indexes, table)
    np.testing.assert_array_equal(back, symbols)
