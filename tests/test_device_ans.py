"""On-device interleaved rANS: primitive-level roundtrips.

Validates the XLA coder against the SAME integer CDF tables the host C++
coder consumes (built by pmf_to_quantized_cdf_batch), including multi-plane
state chaining and the compact/flat word layout the codec drivers use.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resdsic_tpu.coding import pmf_to_quantized_cdf_batch
from resdsic_tpu.coding.device_ans import (
    ans_decode_init,
    ans_decode_plane,
    ans_encode_planes,
    bins_to_values,
    build_device_tables,
    compact_words,
    compact_words_dense,
    lanes_to_plane,
    plane_to_lanes,
    values_to_bins,
)


def _random_table(rng, rows, max_pmf_len):
    lens = rng.integers(2, max_pmf_len + 1, rows)
    pmfs = np.zeros((rows, max_pmf_len), np.float32)
    for r in range(rows):
        p = rng.dirichlet(np.ones(lens[r]) * 0.5).astype(np.float32)
        pmfs[r, : lens[r]] = p * 0.999
    tail = np.full(rows, 1e-3, np.float32)
    t = pmf_to_quantized_cdf_batch(pmfs, tail, lens)
    return t


def _sample_bins(rng, table, rows_ids):
    """Sample symbol bins within each row's real support."""
    hi = table.cdf_length[rows_ids] - 3
    return (rng.random(rows_ids.shape) * (hi + 1)).astype(np.int32)


def test_encode_decode_roundtrip_single_plane():
    rng = np.random.default_rng(0)
    table = _random_table(rng, rows=7, max_pmf_len=40)
    dev, base = build_device_tables(table)
    assert base[0] == 0

    B, L, T = 2, 8, 50
    rows = rng.integers(0, 7, (B, L, T)).astype(np.int32)
    bins = _sample_bins(rng, table, rows)

    states, flags, words = ans_encode_planes(
        jnp.asarray(bins), jnp.asarray(rows), dev
    )
    flat, counts = compact_words(flags, words)

    cap = int(np.asarray(counts).max()) + 1
    carry = ans_decode_init(states, counts, flat, cap)
    carry, out = ans_decode_plane(carry, jnp.asarray(rows), dev)
    np.testing.assert_array_equal(np.asarray(out), bins)
    # fully drained: every lane consumed exactly its words and returned to L
    np.testing.assert_array_equal(
        np.asarray(carry.ptrs), np.asarray(counts)
    )
    assert np.all(np.asarray(carry.states) == 1 << 16)


def test_multi_plane_chaining_matches_single_scan():
    """Planes decoded in sequence must chain through lane states exactly."""
    rng = np.random.default_rng(1)
    t1 = _random_table(rng, rows=5, max_pmf_len=20)
    t2 = _random_table(rng, rows=9, max_pmf_len=60)
    dev, base = build_device_tables(t1, t2)
    assert base[1] == 5

    B, L = 2, 4
    Ta, Tb = 30, 45
    rows_a = rng.integers(0, 5, (B, L, Ta)).astype(np.int32)
    bins_a = _sample_bins(rng, t1, rows_a)
    rows_b = (rng.integers(0, 9, (B, L, Tb)) + 5).astype(np.int32)
    bins_b = _sample_bins(rng, t2, rows_b - 5)

    # ONE encode scan over the full decode sequence [plane_a, plane_b]
    rows = np.concatenate([rows_a, rows_b], axis=-1)
    bins = np.concatenate([bins_a, bins_b], axis=-1)
    states, flags, words = ans_encode_planes(
        jnp.asarray(bins), jnp.asarray(rows), dev
    )
    flat, counts = compact_words(flags, words)

    # TWO decode scans chained through the carry
    cap = int(np.asarray(counts).max()) + 1
    carry = ans_decode_init(states, counts, flat, cap)
    carry, out_a = ans_decode_plane(carry, jnp.asarray(rows_a), dev)
    carry, out_b = ans_decode_plane(carry, jnp.asarray(rows_b), dev)
    np.testing.assert_array_equal(np.asarray(out_a), bins_a)
    np.testing.assert_array_equal(np.asarray(out_b), bins_b)
    assert np.all(np.asarray(carry.states) == 1 << 16)


def test_rate_close_to_entropy():
    """Compressed size must be near the tables' own cross-entropy."""
    rng = np.random.default_rng(2)
    table = _random_table(rng, rows=3, max_pmf_len=16)
    dev, _ = build_device_tables(table)

    B, L, T = 1, 16, 400
    rows = rng.integers(0, 3, (B, L, T)).astype(np.int32)
    # sample from each row's actual quantized distribution
    bins = np.zeros((B, L, T), np.int32)
    for r in range(3):
        m = rows == r
        nb = int(table.cdf_length[r]) - 2
        f = np.diff(table.cdf[r, : nb + 1]).astype(np.float64)
        p = f / f.sum()
        bins[m] = rng.choice(nb, size=int(m.sum()), p=p)
    # clamp away the escape bin like the real encoder does
    bins = np.minimum(bins, (table.cdf_length[rows] - 3))

    states, flags, words = ans_encode_planes(
        jnp.asarray(bins), jnp.asarray(rows), dev
    )
    _, counts = compact_words(flags, words)
    nbytes = 2 * int(np.asarray(counts).sum()) + 4 * B * L  # words + states

    f = np.diff(table.cdf, axis=-1)
    probs = f[rows.reshape(-1), bins.reshape(-1)] / (1 << 16)
    h_bits = -np.sum(np.log2(probs))
    assert nbytes * 8 < h_bits * 1.05 + 8 * 4 * B * L  # within 5% + headers


def test_values_bins_offsets():
    rng = np.random.default_rng(3)
    table = _random_table(rng, rows=4, max_pmf_len=12)
    # give rows distinct offsets
    object.__setattr__(table, "offset", np.array([-3, 0, 2, -1], np.int32))
    dev, _ = build_device_tables(table)
    rows = jnp.asarray(rng.integers(0, 4, (2, 3, 5)).astype(np.int32))
    vals = jnp.asarray(rng.integers(-10, 10, (2, 3, 5)).astype(np.int32))
    bins = values_to_bins(vals, rows, dev)
    assert np.all(np.asarray(bins) >= 0)
    assert np.all(np.asarray(bins) <= np.asarray(dev.max_sym)[np.asarray(rows)])
    back = bins_to_values(bins, rows, dev)
    # in-range values roundtrip exactly
    off = np.asarray(dev.offset)[np.asarray(rows)]
    hi = np.asarray(dev.max_sym)[np.asarray(rows)]
    in_range = (np.asarray(vals) >= off) & (np.asarray(vals) <= off + hi)
    np.testing.assert_array_equal(
        np.asarray(back)[in_range], np.asarray(vals)[in_range]
    )


def test_compact_dense_matches_scatter():
    """The MXU one-hot compaction must agree with the scatter reference."""
    rng = np.random.default_rng(5)
    B, L, T = 2, 4, 300
    flags = jnp.asarray(rng.random((B, L, T)) < 0.15)
    words = jnp.asarray(
        rng.integers(0, 1 << 16, (B, L, T)).astype(np.int32)
    ) * flags.astype(jnp.int32)

    flat, counts = compact_words(flags, words)
    dense, counts2 = compact_words_dense(flags, words, cap=96)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(counts2))

    cnp = np.asarray(counts).reshape(-1)
    base = np.concatenate([[0], np.cumsum(cnp)])
    d = np.asarray(dense)
    for k in range(B * L):
        np.testing.assert_array_equal(
            d[k, : cnp[k]], np.asarray(flat)[base[k] : base[k] + cnp[k]]
        )
    # slots beyond the count are zero (host packer relies on slicing only)
    for k in range(B * L):
        assert np.all(d[k, cnp[k] :] == 0)


def test_plane_lane_layout_roundtrip():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, 100, (3, 1000)).astype(np.int32))
    lanes = plane_to_lanes(x, 16)
    assert lanes.shape == (3, 16, 63)
    back = lanes_to_plane(lanes, 1000)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_plane_lane_interleaved_layout():
    """Strided (v3) layout: lane l holds positions l, l+L, l+2L, ... —
    inverse roundtrips, and a contiguous burst spreads across lanes."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 100, (2, 1000)).astype(np.int32))
    lanes = plane_to_lanes(x, 16, interleave=True)
    assert lanes.shape == (2, 16, 63)
    np.testing.assert_array_equal(
        np.asarray(lanes[0, 3, :5]), np.asarray(x[0, [3, 19, 35, 51, 67]])
    )
    back = lanes_to_plane(lanes, 1000, interleave=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
    # burst dispersion: 64 consecutive nonzeros land 4 per lane (16 lanes)
    flags = np.zeros((1, 1000), bool)
    flags[0, 200:264] = True
    fl = plane_to_lanes(jnp.asarray(flags), 16, interleave=True)
    per_lane = np.asarray(fl).sum(axis=2)[0]
    assert per_lane.max() == 4
    # while the contiguous layout piles them into 2 lanes
    fc = plane_to_lanes(jnp.asarray(flags), 16, interleave=False)
    assert np.asarray(fc).sum(axis=2)[0].max() >= 32


def test_divmod_u32_u16_exact():
    """The float-reciprocal divmod must equal integer `//`/`%` exactly.

    The encode scan's precondition is x < f<<16 (post-renorm rANS state);
    the sweep covers boundary dividends around every multiple region,
    f=1, f=0xffff, and dense random (x, f) pairs.
    """
    from resdsic_tpu.coding.device_ans import divmod_u32_u16

    rng = np.random.default_rng(0)
    fs = np.concatenate([
        np.array([1, 2, 3, 5, 255, 256, 257, 0xFFFE, 0xFFFF], np.uint32),
        rng.integers(1, 1 << 16, 2000).astype(np.uint32),
    ])
    # adversarial x per f: around k*f boundaries and the domain edges
    ks = rng.integers(0, 1 << 16, fs.shape[0]).astype(np.uint64)
    near = (ks * fs.astype(np.uint64)) % (np.uint64(1) << 32)
    xs_list = [
        np.zeros_like(fs),
        fs - 1,
        fs,
        fs + 1,
        (fs.astype(np.uint64) * np.uint64(1 << 16) - 1).astype(np.uint32),
        near.astype(np.uint32),
        np.maximum(near, 1).astype(np.uint32) - 1,
        (near + 1).astype(np.uint32),
    ]
    f_all = np.tile(fs, len(xs_list))
    x_all = np.concatenate(xs_list)
    # enforce the precondition x < f << 16
    lim = f_all.astype(np.uint64) << np.uint64(16)
    x_all = np.minimum(x_all.astype(np.uint64), lim - 1).astype(np.uint32)

    q, r = jax.jit(divmod_u32_u16)(jnp.asarray(x_all), jnp.asarray(f_all))
    np.testing.assert_array_equal(np.asarray(q), x_all // f_all)
    np.testing.assert_array_equal(np.asarray(r), x_all % f_all)
