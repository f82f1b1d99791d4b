"""On-device interleaved rANS — entropy coding inside the XLA program.

The host C++ coder (csrc/rans.cpp) is format-compatible with the reference
(compressai.ans, SURVEY.md §2.7) but forces every symbol plane through the
host: on a tunneled/production TPU the d2h symbol+index traffic (~2.4 MB per
768x512 image) and the 10 sequential host<->device decode round-trips are
the codec's real latency floor, not compute. This module moves the coder
onto the device: S parallel rANS lanes per image advance one symbol per
`lax.scan` step, so the ONLY data crossing the link is the actual
compressed bitstream (~bpp/8 bytes per pixel) plus a tiny per-lane header,
and the channel-autoregressive decode becomes a single dispatch.

Coder math (32-bit state, 16-bit renormalization, precision 16 — the
textbook interleaved-rANS configuration; same per-row integer CDFs as the
host coder, built by csrc/rans.cpp:pmf_to_quantized_cdf, so the symbol
probabilities are bit-identical):

    encode s:  if x >= freq << 16: emit(x & 0xffff); x >>= 16
               x = (x // freq) << 16 | (x % freq) + cdf_lo
    decode:    peek = x & 0xffff;  s = row_lut[peek]
               x = freq * (x >> 16) + peek - cdf_lo
               if x < 1 << 16: x = x << 16 | next_word()

With freq <= 0xffff every encode step emits AT MOST one 16-bit word, so a
scan step is (gather, int div/mod, shifts) per lane — pure VPU work.

Escape/bypass divergence from the host coder: out-of-support symbols are
CLAMPED to the row's support on the encoder (the reference bypass-codes
them losslessly). The encoder's own reconstruction uses the clamped value,
so encoder and decoder stay bit-consistent; at trained-model statistics
the support (6.1 sigma, tables.py:97) makes clamping a ~2^-16-probability
event per symbol. The escape bin's reserved tail mass (>=1/65536 per row)
is the only rate overhead vs the host coder.

Stream format (per image, little-endian):
    [S x uint32 lane states][S x uint32 lane word counts][words uint16...]
Lane l's words are stored in DECODE read order. Planes are chained through
lane states: the encoder scans the decode sequence in reverse, so one lane
set covers z + all y slices with no per-plane flush overhead.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import CdfTable

PRECISION = 16
RANS_L = jnp.uint32(1 << 16)
MASK16 = jnp.uint32(0xFFFF)
LANES_PER_IMAGE = 128

# lax.scan unroll factor for the coder scans: amortizes the TPU while-loop
# per-trip overhead (bounds checks, input dynamic-slices) over several
# symbol steps. Pure perf knob — results are bit-identical at any value.
import os as _os

SCAN_UNROLL = int(_os.environ.get("RESDSIC_ANS_UNROLL", "4"))


# --------------------------------------------------------------------------
# table preparation (host, numpy) — once per codec.update()
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class DeviceAnsTables:
    """Fixed-shape device-side view of one or more CdfTables.

    packed:  (R, Lmax) int32 — bit pattern of (cdf_lo << 16 | freq) per
             bin. One gather yields both encoder operands (each scan step
             is gather-latency bound, so fewer gathers is the lever).
             Stored int32 and bitcast to uint32 AFTER the gather:
             unsigned-typed gathers sent this TPU backend's compiler into
             a >10-minute stall, int32 gathers compile in seconds.
    dec_lut: (R, 65536) int32 — bit pattern of (freq << 16 | peek-cdf_lo)
             per peek value. The decoder's state update x = f*(x>>16) +
             (peek-lo) needs ONLY these two fields, so each decode scan
             step costs a single table gather; the symbol identity is
             recovered OUTSIDE the scan by one big sym_lut gather over
             all peeks at once (off the sequential critical path).
    sym_lut: (R, 65536) int32 — peek value -> symbol bin (dense inverse CDF)
    max_sym: (R,) int32 — last encodable bin (cdf_length - 3; escape excluded)
    offset:  (R,) int32 — symbol value offset per row (value = bin + offset)
    """

    packed: jax.Array
    dec_lut: jax.Array
    sym_lut: jax.Array
    max_sym: jax.Array
    offset: jax.Array
    #: Static (offset, max_sym) tuples for the GC row prefix [0, 64):
    #: pytree AUX data, so the values fold into the compiled program as
    #: constants and values_to_bins/bins_to_values(gc_only=True) can use
    #: a fused select chain instead of per-element gathers (~4.5
    #: ns/element on this backend — 8.3 ms/img across the 11 planes of a
    #: batch-16 encode, tools/ablate_coded_stages.py 'enc no-binmap').
    bin_consts: Optional[Tuple[Tuple[int, ...], Tuple[int, ...]]] = None

    @property
    def rows(self) -> int:
        return self.packed.shape[0]


jax.tree_util.register_pytree_node(
    DeviceAnsTables,
    lambda t: (
        (t.packed, t.dec_lut, t.sym_lut, t.max_sym, t.offset),
        t.bin_consts,
    ),
    lambda aux, ch: DeviceAnsTables(*ch, bin_consts=aux),
)


def build_device_tables(*tables: CdfTable) -> Tuple[DeviceAnsTables, np.ndarray]:
    """Stack CdfTables row-wise into fixed-shape device arrays.

    Returns (device_tables, row_base) where row_base[k] is the first row
    of tables[k] in the combined namespace (e.g. GC rows first, EB rows
    at row_base[1] + channel).
    """
    rows = sum(t.ncdfs for t in tables)
    lmax = max(t.max_len for t in tables) - 1  # bins = boundaries - 1
    packed = np.zeros((rows, lmax), np.uint32)
    dlut = np.zeros((rows, 1 << PRECISION), np.uint32)
    lut = np.zeros((rows, 1 << PRECISION), np.int32)
    max_sym = np.zeros(rows, np.int32)
    offset = np.zeros(rows, np.int32)
    peeks = np.arange(1 << PRECISION, dtype=np.uint32)

    row_base = np.zeros(len(tables), np.int32)
    r = 0
    for k, t in enumerate(tables):
        row_base[k] = r
        for i in range(t.ncdfs):
            L = int(t.cdf_length[i])  # boundary count = pmf_len + 2
            bounds = t.cdf[i, :L]  # [0, ..., 65536]
            f = np.diff(bounds)  # (L-1,) bin freqs, all >= 1
            nb = L - 1
            # freq <= 0xffff (>=2 bins each >=1), cdf_lo <= 65536-freq <= 0xffff
            packed[r, :nb] = (
                bounds[:-1].astype(np.uint32) << 16
            ) | f.astype(np.uint32)
            # dense inverse CDF: peek in [bounds[s], bounds[s+1]) -> s
            lut[r] = np.repeat(np.arange(nb, dtype=np.int32), f)
            f_of_peek = np.repeat(f.astype(np.uint32), f)
            lo_of_peek = np.repeat(bounds[:-1].astype(np.uint32), f)
            dlut[r] = (f_of_peek << 16) | (peeks - lo_of_peek)
            max_sym[r] = nb - 2  # exclude the escape bin
            offset[r] = int(t.offset[i])
            r += 1

    # static consts for the first table's rows (the GC namespace when the
    # conventional [GC, EB...] stacking order is used); capped so the
    # select chains stay short even for unusual stackings
    ngc = int(row_base[1]) if len(tables) > 1 else rows
    ngc = min(ngc, 96)
    dev = DeviceAnsTables(
        packed=jnp.asarray(packed.view(np.int32)),
        dec_lut=jnp.asarray(dlut.view(np.int32)),
        sym_lut=jnp.asarray(lut),
        max_sym=jnp.asarray(max_sym),
        offset=jnp.asarray(offset),
        bin_consts=(
            tuple(int(v) for v in offset[:ngc]),
            tuple(int(v) for v in max_sym[:ngc]),
        ),
    )
    return dev, row_base


def build_split_tables(
    gc: CdfTable, precision: int = PRECISION
) -> Tuple["DeviceAnsTables", np.ndarray, np.ndarray]:
    """Significance-split view of a Gaussian-conditional table.

    Splits each row's distribution at the zero-value (center) bin:
        p(bin) = p0 * [bin == center] + (1 - p0) * p_cond(bin)
    The binary significance plane codes zero/nonzero with p0 taken
    EXACTLY from the original integer table (freq of the center bin), so
    it needs no table at coding time; only nonzero values touch the
    conditional tables built here.

    Returns (cond_dev_tables, p0 (R,) int32, center (R,) int32) where
    cond rows use the center-removed bin index (bin - [bin > center]).
    """
    from . import pmf_to_quantized_cdf_batch

    rows = gc.ncdfs
    p0 = np.zeros(rows, np.int32)
    center = np.zeros(rows, np.int32)
    max_pmf = gc.max_len - 2  # real bins per row upper bound
    pmfs = np.zeros((rows, max_pmf), np.float32)
    tails = np.zeros(rows, np.float32)
    lens = np.zeros(rows, np.int32)
    for r in range(rows):
        L = int(gc.cdf_length[r])
        bounds = gc.cdf[r, :L]
        f = np.diff(bounds).astype(np.float64)  # nb bins, escape last
        nb = L - 1
        c = int(-gc.offset[r])  # bin index of value 0
        assert 0 <= c <= nb - 2, "center bin outside real support"
        center[r] = c
        p0[r] = int(f[c])
        f_real = np.delete(f[: nb - 1], c)  # real bins minus center
        tot = f_real.sum() + f[nb - 1]
        lens[r] = len(f_real)
        if len(f_real):
            pmfs[r, : len(f_real)] = (f_real / max(tot, 1.0)).astype(
                np.float32
            )
        tails[r] = np.float32(f[nb - 1] / max(tot, 1.0))
    # degenerate rows (only the center bin): keep one dummy bin
    lens = np.maximum(lens, 1)
    pmfs[:, 0] = np.maximum(pmfs[:, 0], 1e-9)
    cond = pmf_to_quantized_cdf_batch(pmfs, tails, lens, precision)
    dev, _ = build_device_tables(cond)
    return dev, p0, center


# --------------------------------------------------------------------------
# lane layout
# --------------------------------------------------------------------------


def plane_to_lanes(
    plane: jax.Array, lanes: int, interleave: bool = False
) -> jax.Array:
    """(B, n) -> (B, lanes, T) lane layout, padded at the end.

    interleave=False (legacy, container v1/v2): lane l takes the
    contiguous flat chunk [l*T, (l+1)*T) — spatially bursty statistics
    (edges, occluders) land whole bursts in single lanes, so per-lane
    word/nonzero counts have heavy tails and static caps must be sized
    for the worst lane.

    interleave=True (container v3 default): lane l takes the strided
    positions l, l+lanes, l+2*lanes, ... — adjacent flat positions go to
    different lanes, so each lane samples the whole plane and per-lane
    counts concentrate binomially around the mean (caps sized at
    mean + a few sigma, not at the burst maximum).

    Zero-padding at the flat tail is valid in both layouts (row 0 /
    bin 0 is a legal table entry).
    """
    b, n = plane.shape
    t = -(-n // lanes)
    pad = lanes * t - n
    if pad:
        plane = jnp.pad(plane, ((0, 0), (0, pad)))
    if interleave:
        return plane.reshape(b, t, lanes).transpose(0, 2, 1)
    return plane.reshape(b, lanes, t)


def lanes_to_plane(
    lanes_arr: jax.Array, n: int, interleave: bool = False
) -> jax.Array:
    """(B, lanes, T) -> (B, n), inverting plane_to_lanes' layout."""
    b = lanes_arr.shape[0]
    if interleave:
        flat = lanes_arr.transpose(0, 2, 1).reshape(b, -1)
    else:
        flat = lanes_arr.reshape(b, -1)
    return flat[:, :n]


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def divmod_u32_u16(
    x: jax.Array, f: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Exact (x // f, x % f) for uint32 x < f * 2^16 and f in [1, 0xffff].

    XLA lowers native uint32 division on the TPU VPU as a long bit-serial
    emulation — the dominant per-step cost of the encode scan. A float32
    reciprocal estimate plus exact integer correction rounds computes the
    same quotient in ~a dozen cheap VPU ops. Exactness does NOT depend on
    float rounding: under the precondition x < f<<16 the quotient fits 16
    bits, the f32 estimate is provably within +/-2 of floor(x/f) (relative
    error < 3*2^-24 on a <=2^31 dividend), and the corrections below are
    pure integer arithmetic that repair any +/-2 miss; equality with the
    `//`/`%` path is pinned by tests on both CPU and TPU backends.
    """
    q = jnp.floor(x.astype(jnp.float32) / f.astype(jnp.float32)).astype(
        jnp.uint32
    )
    r = x - q * f  # mod 2^32; an overestimated q wraps r to >= 2^31
    for _ in range(2):
        neg = r >= jnp.uint32(1 << 31)
        q = jnp.where(neg, q - 1, q)
        r = jnp.where(neg, r + f, r)
    for _ in range(2):
        ge = r >= f
        q = jnp.where(ge, q + 1, q)
        r = jnp.where(ge, r - f, r)
    return q, r


def ans_encode_packed(
    pre: jax.Array,  # (B, L, T) int32 — (cdf_lo << 16 | freq) per symbol
    active: Optional[jax.Array] = None,  # (B, L, T) bool; None = all active
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Encode pre-packed (cdf_lo, freq) entries (one reversed ALU scan).

    Inactive steps (active=False) leave the lane state untouched and emit
    nothing — the masked-step mechanism the significance-split value
    planes use for their per-lane variable symbol counts. Inactive
    entries must still carry freq >= 1 (the div executes unmasked).

    Returns (states (B,L) uint32, flags (B,L,T) bool, words (B,L,T) int32):
    flags[b,l,t] marks that decoding symbol t of lane (b,l) consumes
    words[b,l,t]. Word storage is already in decode read order.
    """
    b, l, t = pre.shape
    pre_t = jnp.moveaxis(pre, -1, 0)  # (T, B, L)
    if active is None:
        xs = (pre_t, jnp.ones((t, b, l), jnp.bool_))
    else:
        xs = (pre_t, jnp.moveaxis(active, -1, 0))

    def step(states, x_in):
        p_i32, act = x_in
        p = jax.lax.bitcast_convert_type(p_i32, jnp.uint32)
        f = p & MASK16
        c = p >> 16
        need = act & (states >= (f << 16))
        word = (states & MASK16).astype(jnp.int32)
        x = jnp.where(need, states >> 16, states)
        q, r = divmod_u32_u16(x, f)  # x < f<<16 holds post-renorm
        x = (q << PRECISION) + r + c
        x = jnp.where(act, x, states)
        return x, (need, word)

    init = jnp.full((b, l), RANS_L, jnp.uint32)
    states, (flags_t, words_t) = jax.lax.scan(
        step, init, xs, reverse=True, unroll=SCAN_UNROLL
    )
    return states, jnp.moveaxis(flags_t, 0, -1), jnp.moveaxis(words_t, 0, -1)


def pack_table_entries(
    syms: jax.Array, idxs: jax.Array, tables: DeviceAnsTables
) -> jax.Array:
    """Pre-gather (cdf_lo << 16 | freq) for table-coded symbols — ONE
    parallel gather (in-scan gathers are throughput-bound at ~13
    ns/element on this backend and serialize with the state update)."""
    lmax = tables.packed.shape[1]
    return tables.packed.reshape(-1)[idxs * lmax + syms]


def pack_binary_entries(p0: jax.Array, bits: jax.Array) -> jax.Array:
    """(cdf_lo << 16 | freq) for binary symbols with P(0) = p0/2^16.

    Pure ALU — binary significance planes never touch a table.
    p0 must lie in [1, 65535].
    """
    p0u = p0.astype(jnp.uint32)
    b1 = bits.astype(jnp.uint32)
    f = jnp.where(b1 == 0, p0u, (jnp.uint32(1) << 16) - p0u)
    lo = jnp.where(b1 == 0, jnp.uint32(0), p0u)
    return jax.lax.bitcast_convert_type((lo << 16) | f, jnp.int32)


def ans_encode_planes(
    syms: jax.Array,  # (B, L, T) int32 — symbol BINS, decode order on T
    idxs: jax.Array,  # (B, L, T) int32 — combined-namespace row ids
    tables: DeviceAnsTables,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Encode every lane's table-coded symbol sequence (see
    ans_encode_packed)."""
    return ans_encode_packed(pack_table_entries(syms, idxs, tables))


def compact_words(
    flags: jax.Array, words: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Scatter emitted words into a flat (B*L*T,) buffer, lane-contiguous.

    Returns (flat int32 (B*L*T,), counts (B, L) int32). Lane (b,l)'s words
    occupy flat[base(b,l) : base(b,l)+counts(b,l)] in decode read order,
    where base = exclusive-cumsum of counts in (b, l) raster order.

    NOTE: XLA lowers this scatter by visiting all B*L*T candidate indices
    (~8M for a 768x512 batch-16) even though only ~1% carry a word — fine
    on CPU/small shapes, but ~0.3 s/batch on TPU. The fused encoder uses
    compact_words_dense below instead.
    """
    b, l, t = flags.shape
    fl = flags.reshape(b * l, t)
    wd = words.reshape(b * l, t)
    counts = jnp.sum(fl.astype(jnp.int32), axis=1)
    base = jnp.cumsum(counts) - counts  # exclusive
    pos_in_lane = jnp.cumsum(fl.astype(jnp.int32), axis=1) - 1
    dest = base[:, None] + pos_in_lane  # (B*L, T)
    dest = jnp.where(fl, dest, b * l * t)  # out-of-bounds drops (XLA scatter)
    flat = jnp.zeros(b * l * t, jnp.int32).at[dest.reshape(-1)].set(
        wd.reshape(-1), mode="drop"
    )
    return flat, counts.reshape(b, l)


def compact_words_dense(
    flags: jax.Array, words: jax.Array, cap: int, block: int = 32
) -> Tuple[jax.Array, jax.Array]:
    """Per-lane compaction: (B,L,T) sparse -> (B*L, cap) dense.

    SORT-based rank-select: key = (t if flagged else T), payload = word;
    an ascending per-lane `lax.sort_key_val` moves every flagged word to
    the row prefix in t order. On TPU the sort lowers to vectorized
    compare-exchange passes over the whole (BL, T) tile — unlike the
    previous block-two-level compare-sum, whose `take_along_axis` steps
    were gathers at the ~13 ns/element throughput floor (measured 9.6
    ms/img of the coded encode program at T~1.2k, cap 64-128; the sort
    form measures <1 ms/img — tools/ablate_coded_stages.py). Still no
    scatter (XLA visits every update element — ~0.3 s for the 8M-slot
    encode buffer), no one-hot matmuls, and no float paths that could
    round a word value.

    `block` is kept for API compatibility (the two-level tuning knob);
    the sort form has nothing to tune.

    Returns (dense (B*L, cap) int32, counts (B, L) int32). Slots beyond a
    lane's count are zero. Caller must check counts.max() <= cap (the
    encoder's host driver re-dispatches at a larger cap on overflow).
    """
    del block
    b, l, t = flags.shape
    bl = b * l
    fl = flags.reshape(bl, t)
    wd = words.reshape(bl, t)
    counts = jnp.sum(fl.astype(jnp.int32), axis=1)
    keys = jnp.where(fl, jnp.arange(t, dtype=jnp.int32)[None, :], t)
    _, dense = jax.lax.sort_key_val(keys, wd, dimension=1)
    if t < cap:
        dense = jnp.pad(dense, ((0, 0), (0, cap - t)))
    j = jnp.arange(cap, dtype=jnp.int32)
    dense = jnp.where(j[None, :] < counts[:, None], dense[:, :cap], 0)
    return dense, counts.reshape(b, l)


def flatten_dense_words(
    dense: jax.Array, counts: jax.Array, tcap: int
) -> jax.Array:
    """Ragged flatten of the (B*L, cap) dense word matrix: (tcap,) uint16.

    The rectangular d2h fetch pays cap_fetch columns per lane while real
    lanes hold ~bpp-proportional counts (mean ~30 vs cap 96-128 at the
    trained operating point) — ~2.7x the true payload in dead bytes on a
    ~40 MB/s tunnel link. One device-side sort (key = flat destination
    base[lane]+j for occupied slots, else BIG) compacts the occupied
    words into a prefix in (b, l) raster order — the order the host blob
    packer slices per image — so the fetch is bucket(total_words)
    elements. ~7 ms/batch of sort against ~47
    ms/batch of link time at batch 32.

    tcap must be >= counts.sum() (the caller buckets the fetched total);
    slots past the total read back as junk from dropped keys and are
    sliced off on the host.
    """
    bl, cap = dense.shape
    flatc = counts.reshape(-1)
    base = jnp.cumsum(flatc) - flatc  # (B*L,) exclusive
    j = jnp.arange(cap, dtype=jnp.int32)
    keys = jnp.where(
        j[None, :] < flatc[:, None],
        base[:, None] + j[None, :],
        jnp.int32(bl * cap),
    )
    _, flat = jax.lax.sort_key_val(
        keys.reshape(-1), dense.reshape(-1), dimension=0
    )
    return flat[:tcap].astype(jnp.uint16)


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


@dataclass
class AnsDecodeCarry:
    """Per-lane decoder state threaded across plane scans (a pytree)."""

    states: jax.Array  # (B, L) uint32
    ptrs: jax.Array  # (B, L) int32 — next word offset within the lane
    dense: jax.Array  # (B, L, cap) int32 — per-lane words, decode order

    def tree_flatten(self):
        return (self.states, self.ptrs, self.dense), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    AnsDecodeCarry,
    lambda c: c.tree_flatten(),
    AnsDecodeCarry.tree_unflatten,
)


def ans_decode_init(
    states: jax.Array,
    counts: jax.Array,
    flat_words: jax.Array,
    cap: int,
) -> AnsDecodeCarry:
    """Build the decode carry from the header arrays and the flat stream.

    The flat word buffer is expanded ONCE into a dense (B, L, cap) per-lane
    matrix with a single parallel gather; the scans then read words with an
    exact integer one-hot select (pure VPU) instead of paying the ~13
    ns/element in-scan gather path per renorm.
    """
    b, l = counts.shape
    flatc = counts.reshape(-1)
    base = jnp.cumsum(flatc) - flatc  # (B*L,) exclusive
    nwords = flat_words.shape[0]
    words_i32 = flat_words.astype(jnp.int32)
    idx = base[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    dense = words_i32[jnp.clip(idx, 0, max(nwords - 1, 0))]
    return AnsDecodeCarry(
        states=states.astype(jnp.uint32),
        ptrs=jnp.zeros((b, l), jnp.int32),
        dense=dense.reshape(b, l, cap),
    )


def _renorm_read(states, ptrs, x, dense, jcols):
    """Shared renorm: refill from the dense per-lane word matrix via an
    exact integer one-hot select (pure VPU; no in-scan gather)."""
    need = x < RANS_L
    onehot = (jcols[None, None, :] == ptrs[..., None]).astype(jnp.int32)
    w = jnp.sum(dense * onehot, axis=-1).astype(jnp.uint32)
    x = jnp.where(need, (x << 16) | (w & MASK16), x)
    return x, ptrs + need.astype(jnp.int32)


def ans_decode_binary_plane(
    carry: AnsDecodeCarry,
    p0: jax.Array,  # (B, L, T) int32 — P(bit==0) * 2^16 per position
) -> Tuple[AnsDecodeCarry, jax.Array]:
    """Decode one binary plane — pure-ALU scan steps, NO table gathers.

    Returns (carry, bits (B,L,T) int32). Used by the significance-split
    coder: the zero/nonzero decision of every symbol is coded here at
    ~1 us/step, so only the sparse nonzero values pay the table-gather
    throughput floor.
    """
    p0_t = jnp.moveaxis(p0, -1, 0)
    dense = carry.dense
    jcols = jnp.arange(dense.shape[-1], dtype=jnp.int32)

    def step(c, p0_i):
        states, ptrs = c
        peek = states & MASK16
        p0u = p0_i.astype(jnp.uint32)
        bit = (peek >= p0u).astype(jnp.int32)
        f = jnp.where(bit == 0, p0u, (jnp.uint32(1) << 16) - p0u)
        lo = jnp.where(bit == 0, jnp.uint32(0), p0u)
        x = f * (states >> 16) + peek - lo
        x, ptrs = _renorm_read(states, ptrs, x, dense, jcols)
        return (x, ptrs), bit

    (states, ptrs), bits_t = jax.lax.scan(
        step, (carry.states, carry.ptrs), p0_t, unroll=SCAN_UNROLL
    )
    new_carry = AnsDecodeCarry(states=states, ptrs=ptrs, dense=dense)
    return new_carry, jnp.moveaxis(bits_t, 0, -1)


def rank_select(
    flags: jax.Array, cap: int
) -> Tuple[jax.Array, jax.Array]:
    """Positions of each lane's j-th set flag: (B,L,T) -> (B,L,cap).

    Same all-integer compare-and-sum as compact_words_dense; returns
    (tidx (B,L,cap) int32 clamped to T-1, counts (B,L) int32). Slots
    beyond a lane's count point at T-1 — callers mask on counts.
    """
    b, l, t = flags.shape
    fl = flags.reshape(b * l, t).astype(jnp.int32)
    cum = jnp.cumsum(fl, axis=1)
    counts = cum[:, -1]
    j = jnp.arange(cap, dtype=jnp.int32)
    tidx = jnp.sum(
        (cum[:, None, :] <= j[None, :, None]).astype(jnp.int32), axis=-1
    )
    tidx = jnp.minimum(tidx, t - 1)
    return tidx.reshape(b, l, cap), counts.reshape(b, l)


def ans_decode_plane(
    carry: AnsDecodeCarry,
    idxs: jax.Array,  # (B, L, T) int32 — row ids, decode order
    tables: DeviceAnsTables,
    active: Optional[jax.Array] = None,  # (B, L, T) bool
) -> Tuple[AnsDecodeCarry, jax.Array]:
    """Decode one plane; returns (carry, symbol bins (B,L,T) int32).

    The sequential scan touches only dec_lut (one gather: freq + in-bin
    offset drive the state update); renorm words come from the dense
    per-lane matrix via an integer one-hot select, and symbol bins are
    recovered afterwards with one parallel sym_lut gather over every
    recorded peek — both off the gather-throughput-bound critical path.
    """
    b, l, t = idxs.shape
    idxs_t = jnp.moveaxis(idxs, -1, 0)  # (T, B, L)
    dlut, lut = tables.dec_lut, tables.sym_lut
    dense = carry.dense
    jcols = jnp.arange(dense.shape[-1], dtype=jnp.int32)
    if active is None:
        xs = (idxs_t, jnp.ones((t, b, l), jnp.bool_))
    else:
        xs = (idxs_t, jnp.moveaxis(active, -1, 0))

    def step(c, x_in):
        r, act = x_in
        states, ptrs = c
        peek = (states & MASK16).astype(jnp.int32)
        e = jax.lax.bitcast_convert_type(
            dlut.reshape(-1)[r * (1 << PRECISION) + peek], jnp.uint32
        )
        x = (e >> 16) * (states >> 16) + (e & MASK16)
        need = act & (x < RANS_L)
        onehot = (
            (jcols[None, None, :] == ptrs[..., None]) & need[..., None]
        ).astype(jnp.int32)
        w = jnp.sum(dense * onehot, axis=-1).astype(jnp.uint32)
        x = jnp.where(need, (x << 16) | (w & MASK16), x)
        x = jnp.where(act, x, states)
        ptrs = ptrs + need.astype(jnp.int32)
        return (x, ptrs), peek

    (states, ptrs), peeks_t = jax.lax.scan(
        step, (carry.states, carry.ptrs), xs, unroll=SCAN_UNROLL
    )
    syms_t = lut.reshape(-1)[idxs_t * (1 << PRECISION) + peeks_t]
    new_carry = AnsDecodeCarry(states=states, ptrs=ptrs, dense=dense)
    return new_carry, jnp.moveaxis(syms_t, 0, -1)


# --------------------------------------------------------------------------
# significance-split planes (shared by WACNN and the scalable family)
# --------------------------------------------------------------------------


def split_encode_plane(
    rows_l: jax.Array,  # (B, L, T) int32 — GC row ids, lane layout
    bins_l: jax.Array,  # (B, L, T) int32 — symbol bins
    vals_l: jax.Array,  # (B, L, T) int32 — symbol values (0 == center)
    cond_tables: DeviceAnsTables,
    consts: Tuple[Tuple[int, ...], Tuple[int, ...], Tuple[int, ...]],
    capv: int = 0,
):
    """Encode-side significance split of one lane-layout symbol plane.

    Returns (entry_planes, active_planes, coerced_vals_l, n_overflow,
    n_bad_rows): a pure-ALU binary significance plane over every position
    plus a dense per-lane value plane holding only the nonzero residuals
    (center-removed conditional bins). Nonzeros past the per-lane cap
    are coerced to zero on both sides (n_overflow counts them — the codec
    driver falls back to a lossless path when nonzero, policy
    `on_coding_loss`). n_bad_rows counts row ids outside the split-const
    domain [0, len(p0c)) — map_rows_const silently maps those to
    consts[0], so a nonzero count flags an internal invariant violation
    (only GC rows < 64 may reach a split plane).
    """
    p0c, centc, _ = consts
    ts = rows_l.shape[-1]
    # capv: static per-lane nonzero budget. 0 = the conservative T/2
    # default; serving configs tune it down (codec.split_cap_frac) since
    # the value-plane scan length, the rank-select compare-sums, and the
    # value-entry gathers all scale with it. Overflow is counted and the
    # codec's on_coding_loss policy falls back losslessly.
    capv = min(ts, capv) if capv > 0 else max(8, ts // 2)
    n_bad_rows = jnp.sum(
        ((rows_l < 0) | (rows_l >= len(p0c))).astype(jnp.int32)
    )
    sig = vals_l != 0
    rank = jnp.cumsum(sig.astype(jnp.int32), axis=-1)
    keep = sig & (rank <= capv)
    n_overflow = jnp.sum((sig & ~keep).astype(jnp.int32))
    vals_coerced = jnp.where(keep, vals_l, 0)

    p0_pos = map_rows_const(rows_l, p0c)
    sig_entries = pack_binary_entries(p0_pos, keep)

    tidx, counts_v = rank_select(keep, capv)
    vb = select_by_index(bins_l, tidx)
    vr = select_by_index(rows_l, tidx)
    cb = map_rows_const(vr, centc)
    v_cond = vb - (vb > cb).astype(jnp.int32)
    val_entries = pack_table_entries(v_cond, vr, cond_tables)
    act_val = (
        jnp.arange(capv, dtype=jnp.int32)[None, None, :]
        < counts_v[..., None]
    )
    return (
        [sig_entries, val_entries],
        [jnp.ones_like(keep), act_val],
        vals_coerced,
        n_overflow,
        n_bad_rows,
    )


def split_decode_plane(
    carry: AnsDecodeCarry,
    rows_l: jax.Array,  # (B, L, T) int32
    cond_tables: DeviceAnsTables,
    consts: Tuple[Tuple[int, ...], Tuple[int, ...], Tuple[int, ...]],
    capv: int = 0,
) -> Tuple[AnsDecodeCarry, jax.Array]:
    """Decode-side mirror of split_encode_plane; returns values (B,L,T).
    capv must equal the encoder's (carried in the blob header)."""
    p0c, centc, offc = consts
    ts = rows_l.shape[-1]
    capv = min(ts, capv) if capv > 0 else max(8, ts // 2)
    p0_pos = map_rows_const(rows_l, p0c)
    carry, bits = ans_decode_binary_plane(carry, p0_pos)
    tidx, counts_v = rank_select(bits.astype(jnp.bool_), capv)
    vr = select_by_index(rows_l, tidx)
    act = (
        jnp.arange(capv, dtype=jnp.int32)[None, None, :]
        < counts_v[..., None]
    )
    carry, v_cond = ans_decode_plane(carry, vr, cond_tables, active=act)
    cb = map_rows_const(vr, centc)
    vbin = v_cond + (v_cond >= cb).astype(jnp.int32)
    vvals = jnp.where(act, vbin + map_rows_const(vr, offc), 0)
    # place the k-th decoded value at the lane's k-th set bit
    rank = jnp.cumsum(bits, axis=-1)
    onehot = (
        (rank[..., None] - 1)
        == jnp.arange(capv, dtype=jnp.int32)[None, None, None, :]
    ).astype(jnp.int32) * bits[..., None]
    vals_l = jnp.sum(onehot * vvals[..., None, :], axis=-1)
    return carry, vals_l


# --------------------------------------------------------------------------
# symbol <-> bin mapping
# --------------------------------------------------------------------------


def select_by_index(values: jax.Array, tidx: jax.Array) -> jax.Array:
    """(B,L,T) values selected at (B,L,cap) positions -> (B,L,cap).

    An exact integer one-hot contraction — take_along_axis lowers to the
    ~13 ns/element gather path on this backend, which for the split
    coder's per-slice selects costs more than the whole value scan.
    """
    t = values.shape[-1]
    onehot = (
        jnp.arange(t, dtype=jnp.int32)[None, None, None, :]
        == tidx[..., None]
    ).astype(jnp.int32)
    return jnp.sum(values[:, :, None, :] * onehot, axis=-1)


def map_rows_const(rows: jax.Array, consts: Tuple[int, ...]) -> jax.Array:
    """Per-element lookup into a tiny static table WITHOUT a gather.

    A static select chain over the (64-ish) row ids — constants fold into
    the fused elementwise op, so this is pure VPU work where a gather
    would pay the ~13 ns/element throughput floor.

    Rows outside [0, len(consts)) silently map to consts[0]; the split
    planes only ever carry GC rows (gc_build_indexes output, [0, 64)),
    which the split-table builders size consts to cover exactly.
    """
    acc = jnp.full(rows.shape, int(consts[0]), jnp.int32)
    for r in range(1, len(consts)):
        acc = jnp.where(rows == r, jnp.int32(int(consts[r])), acc)
    return acc


def values_to_bins(
    values: jax.Array, rows: jax.Array, tables: DeviceAnsTables,
    gc_only: bool = False,
) -> jax.Array:
    """Integer symbol values -> clamped per-row bins (encoder side).

    gc_only=True asserts every row id is in the GC prefix covered by
    tables.bin_consts (gc_build_indexes output, [0, 64)) and replaces the
    per-element offset/max_sym gathers (~4.5 ns/element) with fused
    select chains over the static constants (map_rows_const) — the y
    planes of the coded encode dropped 17.1 -> 8.8 ms/img when the
    gathers were ablated out.
    """
    if gc_only and tables.bin_consts is not None:
        off = map_rows_const(rows, tables.bin_consts[0])
        hi = map_rows_const(rows, tables.bin_consts[1])
        return jnp.clip(values - off, 0, hi)
    off = tables.offset[rows]
    hi = tables.max_sym[rows]
    return jnp.clip(values - off, 0, hi)


def bins_to_values(
    bins: jax.Array, rows: jax.Array, tables: DeviceAnsTables,
    gc_only: bool = False,
) -> jax.Array:
    """Per-row bins -> integer symbol values (decoder side).

    gc_only: see values_to_bins."""
    if gc_only and tables.bin_consts is not None:
        return bins + map_rows_const(rows, tables.bin_consts[0])
    return bins + tables.offset[rows]


# -- lossless outlier sidecar ------------------------------------------------
#
# The in-stream coder clamps out-of-support symbols (and the significance-
# split value planes cap per-lane nonzeros), which would lose information;
# the reference bypass-codes such outliers losslessly (SURVEY §2.7,
# csrc/rans.cpp:134-152 escape path). The device paths recover losslessness
# with a SIDECAR: the encoder collects (flat position, value delta) pairs
# for every element whose decodable value differs from the true quantized
# symbol, the codec driver appends them to the blob, and the decoder
# scatters the deltas back onto the decoded planes BEFORE any downstream
# use — so both sides reconstruct from the TRUE values and the coded
# roundtrip is bit-exact even on saturating inputs.


def collect_outliers(
    deltas: jax.Array, cap: int, seg: int = 8192
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-select the nonzero entries of a (B, N) delta tensor.

    Returns (pos (B, cap) int32 padded with N, dval (B, cap) int32,
    n (B,) int32 true counts — may exceed cap, callers must check).

    Two-stage segmented sort, scatter-free: the original one-shot scatter
    had B*N update elements (~8M at encode shapes, ~10 ms/img — XLA
    visits every update), and a single full-length sort would pay
    log^2(N) ~ 361 compare-exchange passes. Instead each `seg`-length
    segment sorts its outliers to its prefix (log^2(seg) ~ 91 passes over
    the same data volume), the per-segment prefixes of length min(cap,
    seg) concatenate into a candidate row, and one short second sort
    orders the candidates globally. Exact for every n <= cap: a segment
    can contribute at most min(cap, seg) entries, so no candidate that
    belongs in the first `cap` can be dropped; n > cap already forces the
    driver's re-dispatch (counts stay exact via the global reduction).
    """
    b, n = deltas.shape
    nz = deltas != 0
    n_true = jnp.sum(nz.astype(jnp.int32), axis=1)
    ns = -(-n // seg)
    npad = ns * seg
    pos_src = jnp.broadcast_to(jnp.arange(npad, dtype=jnp.int32), (b, npad))
    if npad != n:
        deltas = jnp.pad(deltas, ((0, 0), (0, npad - n)))
        nz = jnp.pad(nz, ((0, 0), (0, npad - n)))
    # key = flat position for outliers, npad for everything else; the
    # payload beyond a row's count is always a zero delta (nz false)
    keys = jnp.where(nz, pos_src, npad)
    c = min(cap, seg)
    k1, d1 = jax.lax.sort(
        (keys.reshape(b * ns, seg), deltas.reshape(b * ns, seg)),
        dimension=1, num_keys=1,
    )
    k2 = k1[:, :c].reshape(b, ns * c)
    d2 = d1[:, :c].reshape(b, ns * c)
    if ns > 1:
        k2, d2 = jax.lax.sort((k2, d2), dimension=1, num_keys=1)
    if k2.shape[1] < cap:
        k2 = jnp.pad(k2, ((0, 0), (0, cap - k2.shape[1])),
                     constant_values=npad)
        d2 = jnp.pad(d2, ((0, 0), (0, cap - d2.shape[1])))
    pos = jnp.where(k2[:, :cap] >= n, n, k2[:, :cap])
    return pos, d2[:, :cap], n_true


def scatter_outliers(
    pos: jax.Array, dval: jax.Array, n: int
) -> jax.Array:
    """Dense (B, N) int32 delta tensor from sidecar pairs (pads dropped)."""
    b, cap = pos.shape
    dense = jnp.zeros((b, n), jnp.int32)
    if cap == 0:
        return dense
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    return dense.at[rows, pos].add(dval, mode="drop")
