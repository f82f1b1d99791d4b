"""Host-side codec drivers: orchestrate jitted device programs + native rANS.

This is the runtime layer that replaces the reference's eager
compress()/decompress() methods (cnn.py:217-342): pure jitted device
programs compute symbols/params; the native C++ coder turns them into bytes.

Bitstream container formats:
  * host-coder paths: strings = [y_strings, z_strings] (lists over the
    batch) of raw CompressAI-format rANS bytes, matching the reference's
    {"strings": [...], "shape": z_spatial} contract (cnn.py:217-342).
    These streams carry NO extra framing — byte-parity with the
    reference is the point.
  * device-coded paths: one self-describing blob per image —
        [u8 magic 0xD5][u8 version][u8 flags][u8 0][u16 lanes][u16 capv]
        [f32 quality][lanes x u32 states][lane counts][u16 words…]
        [optional sidecar]
    (little-endian; flags bit0 = significance-split, bit1 = has-prog,
    bit2 = lossless outlier sidecar). Version history:
      v1  u32 lane counts, contiguous lane layout, raw sidecar
      v2  u16 lane counts (counts are bounded by ~2 words/symbol x lane
          length)
      v3  interleaved (strided) lane layout — spatial bursts spread
          across lanes (device_ans.plane_to_lanes) — and a compact
          escape-coded sidecar (~3 B/outlier, _pack_sidecar)
      v4  v3 + PER-PLANE split value caps: [u16 ncaps][ncaps x u16]
          after the base header (header capv field is 0) — each y
          slice's value plane budget sized from its own significance
          rate (autotune_coded)
      v5  BATCH container (coded_batch_container=True): ONE blob for the
          whole batch — header byte 3 carries the batch size (<=255),
          flags bit3 = per-plane caps block follows, bit4 = contiguous
          (non-interleaved) lane layout; then [B x lanes u32 states]
          [B x lanes u16 counts][concatenated word streams in batch
          order][if bit2: B x u32 sidecar entry counts + concatenated
          escape-coded sidecars]. Amortizes the header + caps block and
          the per-image parse across the batch for serving.
      v6  rate-packed per-image container (default writer): v5-style
          flag bits on a per-image blob — bit3 = per-plane caps block,
          bit4 = contiguous layout, bit5 = width-packed lane counts
          ([u16 base][u8 width][L x width bits] — counts concentrate
          under the interleaved layout), bit6 = Golomb-Rice sidecar
          ([u8 kp][u8 kv][Rice bits]: position first-differences +
          zigzag value deltas, ~10 bits/entry vs v3's ~24.6). v5 batch
          containers carry the same two flag bits.
    The encoder writes v6 by default (container_packed_counts /
    container_rice_sidecar both off falls back to v4/v3/v2 as before),
    or one v5 blob in batch-container mode; the parser reads all six.
    decompress_coded validates the header and decodes
    with the header's own version/lanes/split/quality, so a mismatched
    decoder config raises instead of desyncing (ref analogue: the 2-/
    4-part self-describing strings of independent.py:611-627).
"""

from __future__ import annotations

import functools
import struct
import warnings
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class CodedStreamError(RuntimeError):
    """Raised when a device-coded container fails validation: bad
    magic/version, header/config mismatch, or the decoded stream does not
    drain (lane states / word pointers off — a desynced or corrupt blob)."""


class CodingLossError(RuntimeError):
    """Raised (on_coding_loss="raise") when the device encoder would lose
    information: symbols clamped to the CDF support or split-cap overflow
    — cases the reference bypass-codes losslessly (SURVEY §2.7)."""


_BLOB_MAGIC = 0xD5
# v2 stores per-lane word counts as u2 (they are bounded by ~2 symbols/word
# x lane length << 65536), halving the 8 B/lane header to 6 B — ~1 KB/image
# at L=512. v3 additionally switches to the INTERLEAVED lane layout
# (device_ans.plane_to_lanes interleave=True): spatial bursts spread
# across lanes so per-lane word/nonzero counts concentrate around the
# mean. v1 (u4 counts) and v2 (contiguous-layout) blobs are still read.
_BLOB_VERSION = 3
_BLOB_HEADER = struct.Struct("<BBBBHHf")  # magic, ver, flags, 0, lanes, capv, q

# Shared pool for per-image rANS calls: the ctypes calls release the GIL, so
# the 16-ish independent streams of a batch encode/decode in parallel.
_HOST_POOL = ThreadPoolExecutor(max_workers=8, thread_name_prefix="rans")


# -- container v6 bit-level codecs (host, numpy) -----------------------------
#
# Rate budget (tools/rate_budget.py, VERDICT r4 weak #2): at the trained
# operating point the v3 escape-coded sidecar spends ~24.6 bits/entry while
# the entry entropy is ~8.1 (gaps cluster: median 18; deltas are +/-1-2),
# and the u16 lane-count block spends 16 bits/lane on counts whose per-blob
# range fits in ~6. v6 closes both with plain bit-packing: Golomb-Rice
# coded (gap, zigzag-delta) sidecar pairs and width-packed counts.

_RICE_ESC_Q = 24  # unary quotients cap here; then 32 raw bits of the value


def _rice_cost(vals: np.ndarray, k: int) -> int:
    q = vals >> k
    esc = q >= _RICE_ESC_Q
    return int(np.sum(np.where(esc, _RICE_ESC_Q + 32, q + 1 + k)))


def _rice_pick_k(vals: np.ndarray) -> int:
    if not len(vals):
        return 0
    mean = float(vals.mean())
    k0 = min(15, max(0, int(mean).bit_length() - 1))
    ks = range(max(0, k0 - 2), min(15, k0 + 2) + 1)
    return min(ks, key=lambda k: _rice_cost(vals, k))


def _rice_bits(vals: np.ndarray, k: int) -> np.ndarray:
    """Rice(k) bit array (MSB-first per code) for non-negative int64 vals.

    Vectorized: per-entry code lengths -> flat offsets -> one pass per
    bit column (k <= 15 remainder columns, 32 escape columns)."""
    q = vals >> k
    esc = q >= _RICE_ESC_Q
    ones = np.where(esc, _RICE_ESC_Q, q)
    lens = np.where(esc, _RICE_ESC_Q + 32, q + 1 + k)
    offs = np.cumsum(lens) - lens
    arr = np.zeros(int(lens.sum()), np.uint8)
    # unary prefix: `ones[i]` 1-bits at offs[i]
    tot1 = int(ones.sum())
    if tot1:
        co = np.cumsum(ones) - ones
        idx = np.repeat(offs, ones) + (
            np.arange(tot1, dtype=np.int64) - np.repeat(co, ones)
        )
        arr[idx] = 1
    ne = ~esc
    if k:
        base = offs[ne] + q[ne] + 1
        v = vals[ne]
        for j in range(k):
            arr[base + j] = (v >> (k - 1 - j)) & 1
    if esc.any():
        base = offs[esc] + _RICE_ESC_Q
        v = vals[esc]
        for j in range(32):
            arr[base + j] = (v >> (31 - j)) & 1
    return arr


def _rice_encode_sidecar(pos: np.ndarray, dval: np.ndarray) -> bytes:
    """v6 sidecar: [u8 kp][u8 kv][Rice bitstream], byte-aligned.

    Positions are strictly increasing: code first-differences (first
    entry absolute). Value deltas are zigzag-mapped then Rice-coded."""
    pos = np.asarray(pos, np.int64)
    dval = np.asarray(dval, np.int64)
    if not len(pos):
        return b""
    dp = np.diff(pos, prepend=np.int64(0))
    zz = np.where(dval >= 0, dval << 1, (-dval << 1) - 1)
    kp = _rice_pick_k(dp)
    kv = _rice_pick_k(zz)
    bits = np.concatenate([_rice_bits(dp, kp), _rice_bits(zz, kv)])
    return struct.pack("<BB", kp, kv) + np.packbits(bits).tobytes()


def _rice_decode_sidecar(blob: bytes, off: int, n: int):
    """Inverse of _rice_encode_sidecar; returns ((pos, dval), bytes_read)."""
    if n == 0:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32)), 0
    if len(blob) < off + 2:
        raise CodedStreamError("blob truncated before the rice sidecar")
    kp, kv = struct.unpack_from("<BB", blob, off)
    # bound the unpacked window by the worst-case code length (escape
    # codes), so batch containers don't unpack the whole remaining blob
    max_bytes = min(
        len(blob) - off - 2, (2 * n * (_RICE_ESC_Q + 32) + 7) // 8
    )
    bits = np.unpackbits(
        np.frombuffer(blob, np.uint8, max_bytes, offset=off + 2)
    )
    cursor = 0
    nbits = len(bits)

    def read_rice(k: int, count: int) -> np.ndarray:
        nonlocal cursor
        out = np.empty(count, np.int64)
        for i in range(count):
            q = 0
            while q < _RICE_ESC_Q:
                if cursor >= nbits:
                    raise CodedStreamError("rice sidecar ran out of bits")
                b = bits[cursor]
                cursor += 1
                if not b:
                    break
                q += 1
            if q >= _RICE_ESC_Q:
                if cursor + 32 > nbits:
                    raise CodedStreamError("rice sidecar ran out of bits")
                v = 0
                for _ in range(32):
                    v = (v << 1) | int(bits[cursor])
                    cursor += 1
                out[i] = v
            else:
                r = 0
                for _ in range(k):
                    if cursor >= nbits:
                        raise CodedStreamError("rice sidecar ran out of bits")
                    r = (r << 1) | int(bits[cursor])
                    cursor += 1
                out[i] = (q << k) | r
        return out

    dp = read_rice(kp, n)
    zz = read_rice(kv, n)
    pos = np.cumsum(dp)
    dval = np.where(zz & 1, -((zz + 1) >> 1), zz >> 1)
    nread = 2 + (cursor + 7) // 8
    return (pos.astype(np.int32), dval.astype(np.int32)), nread


def _state_hi_tables():
    """Static integer CDFs for the rANS-coded state high bytes.

    The final encoder state is ~log-uniform over [2^16, 2^32): byte3
    (x >> 24) is 0 with probability ~1/2 (x < 2^24) and otherwise
    ~log-uniform over [1, 255]; byte2 is log-uniform when byte3 is 0 and
    ~uniform otherwise. Coding the two bytes against these smooth priors
    recovers ~4-5 of the 16 stored bits per lane. The tables are built
    deterministically from closed-form pmfs via the SAME integer
    quantizer the codec uses everywhere (pmf_to_quantized_cdf), so both
    sides always agree."""
    from ..coding import CdfTable, pmf_to_quantized_cdf

    k = np.arange(1, 256, dtype=np.float64)
    logu = np.log1p(1.0 / k)
    logu /= logu.sum()
    # row 0: byte2 = (x >> 16) & 0xFF — mixture of log-uniform (b3 == 0)
    # and uniform (b3 > 0)
    p2 = np.empty(256)
    p2[0] = 0.5 / 256
    p2[1:] = 0.5 * logu + 0.5 / 256
    # row 1: byte3 = x >> 24 — point mass at 0 + log-uniform tail
    p3 = np.empty(256)
    p3[0] = 0.5
    p3[1:] = 0.5 * logu
    rows = []
    for p in (p2, p3):
        cdf = np.asarray(
            pmf_to_quantized_cdf(np.asarray(p / p.sum(), np.float32), 16),
            np.int32,
        )
        rows.append(cdf)
    lmax = max(len(r) for r in rows)
    cdf = np.zeros((2, lmax), np.int32)
    for i, r in enumerate(rows):
        cdf[i, : len(r)] = r
    return CdfTable(
        cdf=cdf,
        cdf_length=np.asarray([len(rows[0]), len(rows[1])], np.int32),
        offset=np.zeros(2, np.int32),
    )


_STATE_HI_TABLES = None


def _get_state_hi_tables():
    global _STATE_HI_TABLES
    if _STATE_HI_TABLES is None:
        _STATE_HI_TABLES = _state_hi_tables()
    return _STATE_HI_TABLES


def _pack_lane_header(states: np.ndarray, counts: np.ndarray) -> bytes:
    """Tight lane header (v6 flag bit7): the per-lane fixed cost is the
    floor of the container overhead (tools/rate_budget.py), so both
    arrays get entropy treatment:

      states: low 16 bits raw (uniform, incompressible); high bytes
        (b2, b3) rANS-coded against static log-uniform priors
        (_state_hi_tables) — ~4-5 bits/lane recovered.
      counts: u32 total + per-lane Rice-coded zigzag deviations from
        round(total / n) — deviations concentrate binomially, ~4-6
        bits/lane vs 16 raw.

    Layout: [u32 total][u8 kc][rice bytes (len implied)][n x u16 lo16]
            [u16 hi_len][hi rANS bytes]
    with the rice stream byte-aligned and self-delimiting via n.
    """
    from .. import coding as _coding

    states = np.asarray(states, np.uint32).reshape(-1)
    counts = np.asarray(counts, np.int64).reshape(-1)
    n = len(counts)
    total = int(counts.sum())
    mean = int(round(total / max(n, 1)))
    dev = counts - mean
    zz = np.where(dev >= 0, dev << 1, (-dev << 1) - 1)
    kc = _rice_pick_k(zz)
    rice = np.packbits(_rice_bits(zz, kc)).tobytes()
    lo16 = (states & 0xFFFF).astype("<u2").tobytes()
    hi = np.empty(2 * n, np.int32)
    hi[0::2] = (states >> 16) & 0xFF
    hi[1::2] = states >> 24
    idx = np.empty(2 * n, np.int32)
    idx[0::2] = 0
    idx[1::2] = 1
    hi_bytes = bytes(
        _coding.RansEncoder().encode_with_indexes(
            hi.tolist(), idx.tolist(), _get_state_hi_tables()
        )
    )
    return (
        struct.pack("<IB", total, kc)
        + struct.pack("<I", len(rice))
        + rice
        + lo16
        + struct.pack("<I", len(hi_bytes))
        + hi_bytes
    )


def _parse_lane_header(blob: bytes, off: int, n: int):
    """Inverse of _pack_lane_header; returns ((states u32, counts i64),
    bytes_read)."""
    from .. import coding as _coding

    if len(blob) < off + 9:
        raise CodedStreamError("blob truncated before the lane header")
    total, kc, rice_len = struct.unpack_from("<IBI", blob, off)
    p = off + 9
    if len(blob) < p + rice_len + 2 * n + 4:
        raise CodedStreamError("blob truncated inside the lane header")
    zz = _rice_read(blob, p, rice_len, kc, n)
    p += rice_len
    dev = np.where(zz & 1, -((zz + 1) >> 1), zz >> 1)
    mean = int(round(total / max(n, 1)))
    counts = dev + mean
    if counts.min() < 0 or int(counts.sum()) != total:
        raise CodedStreamError(
            "lane-header counts do not reconcile with the stored total"
        )
    lo16 = np.frombuffer(blob, "<u2", n, offset=p).astype(np.uint32)
    p += 2 * n
    (hi_len,) = struct.unpack_from("<I", blob, p)
    p += 4
    if len(blob) < p + hi_len:
        raise CodedStreamError("blob truncated inside the state stream")
    idx = np.empty(2 * n, np.int32)
    idx[0::2] = 0
    idx[1::2] = 1
    hi = np.asarray(
        _coding.RansDecoder().decode_with_indexes(
            blob[p : p + hi_len], idx.tolist(), _get_state_hi_tables()
        ),
        np.int64,
    )
    p += hi_len
    states = (
        lo16
        | (hi[0::2].astype(np.uint32) << 16)
        | (hi[1::2].astype(np.uint32) << 24)
    )
    return (states, counts.astype(np.int64)), p - off


def _rice_read(blob: bytes, off: int, nbytes: int, k: int, n: int):
    """Decode n Rice(k) values from a byte-aligned bit region."""
    bits = np.unpackbits(np.frombuffer(blob, np.uint8, nbytes, offset=off))
    out = np.empty(n, np.int64)
    cursor = 0
    nbits = len(bits)
    for i in range(n):
        q = 0
        while q < _RICE_ESC_Q:
            if cursor >= nbits:
                raise CodedStreamError("rice region ran out of bits")
            b = bits[cursor]
            cursor += 1
            if not b:
                break
            q += 1
        if q >= _RICE_ESC_Q:
            if cursor + 32 > nbits:
                raise CodedStreamError("rice region ran out of bits")
            v = 0
            for _ in range(32):
                v = (v << 1) | int(bits[cursor])
                cursor += 1
            out[i] = v
        else:
            if cursor + k > nbits:
                raise CodedStreamError("rice region ran out of bits")
            r = 0
            for _ in range(k):
                r = (r << 1) | int(bits[cursor])
                cursor += 1
            out[i] = (q << k) | r
    return out


def _pack_counts(counts: np.ndarray) -> bytes:
    """Width-packed lane counts: [u16 base][u8 width][ceil(n*w/8) bytes].

    Interleaved lanes concentrate counts binomially around the mean, so
    the per-blob (max - min) range typically fits 5-7 bits vs the u16
    block's 16."""
    c = np.asarray(counts, np.int64).reshape(-1)
    base = int(c.min()) if c.size else 0
    rel = c - base
    width = int(rel.max()).bit_length() if c.size and rel.max() > 0 else 0
    head = struct.pack("<HB", base, width)
    if width == 0:
        return head
    bits = (rel[:, None] >> np.arange(width - 1, -1, -1)[None, :]) & 1
    return head + np.packbits(bits.astype(np.uint8).reshape(-1)).tobytes()


def _parse_counts(blob: bytes, off: int, n: int):
    """Inverse of _pack_counts; returns (counts (n,) int64, bytes_read)."""
    if len(blob) < off + 3:
        raise CodedStreamError("blob truncated before the counts block")
    base, width = struct.unpack_from("<HB", blob, off)
    if width == 0:
        return np.full(n, base, np.int64), 3
    nbytes = (n * width + 7) // 8
    if len(blob) < off + 3 + nbytes:
        raise CodedStreamError("blob truncated inside the counts block")
    bits = np.unpackbits(
        np.frombuffer(blob, np.uint8, nbytes, offset=off + 3),
        count=n * width,
    ).reshape(n, width)
    weights = (1 << np.arange(width - 1, -1, -1)).astype(np.int64)
    return base + bits.astype(np.int64) @ weights, 3 + nbytes

from ..coding import CdfTable, coder_classes
from ..entropy import build_eb_table, build_gc_table, eb_medians, get_scale_table
from ..entropy.tables import eb_build_indexes


class WACNNCodec:
    """Real-bitstream codec for the WACNN model family.

    Usage:
        codec = WACNNCodec(model, params)
        codec.update()                      # build integer CDF tables
        out = codec.compress(x)             # {"strings": [...], "shape": ...}
        rec = codec.decompress(out["strings"], out["shape"])
    """

    #: What compress_coded does when the device coder would lose
    #: information (support clamp or split-cap overflow — the reference
    #: bypass-codes both losslessly):
    #:   "fallback" (default): transparently re-encode via the lossless
    #:       host-coder path; decompress_coded auto-detects the container.
    #:   "raise": raise CodingLossError.
    #:   "warn": keep the lossy blob and warn (round-2 behavior).
    on_coding_loss: str = "fallback"

    #: Verify the drained-stream invariant after every coded decode (the
    #: cost is one tiny device scalar fetch; a desynced stream raises
    #: CodedStreamError instead of returning corrupt output).
    decode_check: bool = True

    def __init__(self, model, params):
        self.model = model
        self.params = params
        # bind the session's default entropy coder ("ans" | "rangecoder"),
        # as the reference binds _EntropyCoder at EntropyModel construction
        # (entropy_models.py:17-51)
        self._enc_cls, self._dec_cls, self._buf_enc_cls = coder_classes()
        from .. import get_entropy_coder

        # host-stream coder identity: compress() tags its result with this
        # name and decompress(coder=...) validates it — decoding an "ans"
        # stream with the range coder (or vice versa) yields garbage or an
        # opaque exception otherwise
        self.coder_name = get_entropy_coder()
        self.eb_table: CdfTable | None = None
        self.gc_table: CdfTable | None = None
        self.scale_table = get_scale_table()

        self._analyze_fn = jax.jit(functools.partial(model.apply, method="analyze"))
        self._quantize_fn = jax.jit(
            functools.partial(model.apply, method="quantize_slice"),
            static_argnames=("slice_index",),
        )
        # fused single-dispatch programs (tunnel-dispatch overhead dominates
        # on axon; bit-equality with the stepped path is verified by selftest)
        self._encode_fn = jax.jit(
            functools.partial(model.apply, method="encode_device")
        )
        self._decode_begin_fn = jax.jit(
            functools.partial(model.apply, method="decode_begin")
        )
        self._decode_step_fn = jax.jit(
            functools.partial(model.apply, method="decode_step"),
            static_argnames=("slice_index",),
        )
        self._decode_end_fn = jax.jit(
            functools.partial(model.apply, method="decode_end")
        )
        self._hyper_fn = jax.jit(
            functools.partial(model.apply, method="hyper_synthesis")
        )
        self._slice_params_fn = jax.jit(
            functools.partial(model.apply, method="slice_params"),
            static_argnames=("slice_index",),
        )
        self._slice_rec_fn = jax.jit(
            functools.partial(model.apply, method="slice_reconstruct"),
            static_argnames=("slice_index",),
        )
        self._synth_fn = jax.jit(functools.partial(model.apply, method="synthesize"))

        # fully-fused on-device-coded paths (entropy coding inside XLA):
        # ONE dispatch per direction; only compressed words cross the link
        self.coded_lanes = 128
        # significance-split coding (zero/nonzero binary plane + sparse
        # value plane): ~6x fewer table-gathered symbols on the decode
        # scan's critical path at trained-model sparsity
        self.coded_split = False
        # split_cap_frac: per-lane nonzero budget of the significance-split
        # value planes as a fraction of the lane length. 0.5 (=T/2) is the
        # conservative default; serving configs tune it to the model's
        # measured significance rate — the value-plane scan length and the
        # rank-select/select costs all scale with it, and overflow falls
        # back losslessly via on_coding_loss.
        self.split_cap_frac = 0.5
        # coded_word_cap: static per-lane word capacity of the encoder's
        # dense compaction (None = in-model default T/16). The compaction
        # compare-sum is O(cap * T) per lane, so serving configs set this
        # to a small bucket above the workload's observed counts.max();
        # overflow re-dispatches at the next power of two (warned, rare).
        self.coded_word_cap = None
        # lossless outlier sidecar budget (max out-of-support symbols per
        # image recovered via the blob's sidecar; overflow re-dispatches at
        # the exact bucketed count). 0 disables (round-2 clamp behavior).
        self.sidecar_cap = 512
        # interleaved (strided) lane layout — container v3; False emits
        # legacy contiguous-layout v2 blobs (see device_ans.plane_to_lanes)
        self.coded_interleave = True
        # batch-container mode (container v5): compress_coded emits ONE
        # self-describing blob for the whole batch instead of a blob per
        # image — fewer header bytes and one parse per batch (serving
        # path; per-image blobs remain the default so streams stay
        # individually addressable)
        self.coded_batch_container = False
        # container v6 rate features (tools/rate_budget.py): width-packed
        # lane counts (~16 -> ~6 bits/lane) and Golomb-Rice sidecar
        # (~24.6 -> ~10 bits/entry). Both on by default; turning either
        # off falls back to the v2-v5 writers (parsers read everything).
        self.container_packed_counts = True
        self.container_rice_sidecar = True
        # tight lane header (v6 flag bit7): entropy-coded state high
        # bytes + Rice count deviations — the per-lane fixed cost is the
        # binding term of the <=3% inflation budget (VERDICT r5 #1)
        self.container_tight_header = True
        # autotune cap policy: budget the split value planes at this
        # quantile of the measured per-lane nonzero counts, capped at
        # split_cap_max_frac of the lane length. max_frac 0.5 keeps the
        # legacy scan-length guarantee; rate-sensitive configs raise it
        # to 1.0 so dense lanes code in-stream instead of overflowing
        # into the sidecar (~10 bits/entry vs ~the conditional-table
        # cost — roughly neutral in rate, but in-stream keeps the
        # sidecar small enough for fast parses).
        self.split_cap_quantile = 0.999
        self.split_cap_max_frac = 0.5
        self._encode_coded_fn = jax.jit(
            functools.partial(model.apply, method="encode_coded"),
            static_argnames=(
                "lanes", "cap", "split_consts", "split_capv", "sidecar_cap",
                "interleave",
            ),
        )
        self._decode_coded_fn = jax.jit(
            functools.partial(model.apply, method="decode_coded"),
            static_argnames=(
                "z_shape", "lanes", "cap", "split_consts", "split_capv",
                "interleave",
            ),
        )
        # serving mesh (place_on_mesh): when set, the coded paths shard
        # the batch over the mesh's data axes — SURVEY §2.11's TPU-native
        # serving story (pure data parallelism; lanes are per-image, so
        # the rANS scans never cross devices)
        self.serve_mesh = None

    def place_on_mesh(self, mesh) -> None:
        """Bind a jax.sharding.Mesh for data-parallel coded serving.

        Params and CDF tables are replicated over the mesh;
        compress_coded then shards the input batch over the mesh's axes
        and decompress_coded shards the per-image header arrays the same
        way (the flat word stream is replicated — compressed bytes are
        tiny next to the transform activations). Blobs are bit-identical
        to single-device serving (tests/test_coded_path.py)."""
        from ..parallel.mesh import replicate

        self._check_updated()
        repl = replicate(mesh)
        self.serve_mesh = mesh
        self.params = jax.device_put(self.params, repl)
        self.dev_tables = jax.device_put(self.dev_tables, repl)
        if getattr(self, "split_tables", None) is not None:
            self.split_tables = jax.device_put(self.split_tables, repl)

    def _place_batch(self, arr, b: Optional[int] = None):
        """Shard a batch-leading array over the serving mesh (replicate
        when the batch doesn't divide the mesh)."""
        if self.serve_mesh is None:
            return arr if isinstance(arr, jax.Array) else jnp.asarray(arr)
        from ..parallel.mesh import batch_sharding, replicate

        n = int(np.prod([self.serve_mesh.shape[a]
                         for a in self.serve_mesh.axis_names]))
        b = int(arr.shape[0]) if b is None else b
        sh = (
            batch_sharding(self.serve_mesh)
            if b % n == 0 else replicate(self.serve_mesh)
        )
        return jax.device_put(arr, sh)

    def _place_replicated(self, arr):
        if self.serve_mesh is None:
            return jnp.asarray(arr)
        from ..parallel.mesh import replicate

        return jax.device_put(arr, replicate(self.serve_mesh))

    @staticmethod
    def _warn_saturation(out: Dict[str, Any]) -> None:
        """Surface int8 symbol-clamp saturation on the HOST-coder encode
        path (encode_device clamps residuals to int8 for the d2h transfer;
        the reference bypass-codes outliers losslessly — warn loudly when
        trained-model statistics are violated)."""
        n = int(np.asarray(out.get("n_saturated", 0)))
        if n:
            warnings.warn(
                f"{n} y symbols saturated the int8 clamp and will be "
                "reconstructed incorrectly — the codec's narrow-transfer "
                "path assumes trained-model residual statistics "
                "(|y - mu| <= 127)",
                RuntimeWarning,
                stacklevel=3,
            )

    @staticmethod
    def _check_bad_rows(out: Dict[str, Any]) -> None:
        """n_bad_rows is an internal invariant, never a policy matter —
        it always raises."""
        n_bad = int(np.asarray(out.get("n_bad_rows", 0)))
        if n_bad:
            raise RuntimeError(
                f"{n_bad} split-plane rows fell outside the split-const "
                "domain [0, 64) — internal invariant violation in the "
                "significance-split coder (map_rows_const would silently "
                "mis-map them)"
            )

    def _coding_loss(self, out: Dict[str, Any]) -> int:
        """Inspect the device encoder's loss counters; returns the number
        of lost symbols (policy dispatch happens in the caller so
        'fallback' can re-encode). Only consulted when the lossless
        sidecar is disabled — with a sidecar the clamp/overflow counters
        are recovered losslessly and carry no policy weight."""
        self._check_bad_rows(out)
        n_clamp = int(np.asarray(out.get("n_clamped", 0)))
        n_over = int(np.asarray(out.get("n_overflow", 0)))
        n = n_clamp + n_over
        if not n:
            return 0
        detail = []
        if n_clamp:
            detail.append(
                f"{n_clamp} symbols clamped to the CDF support "
                "(the reference bypass-codes these losslessly)"
            )
        if n_over:
            detail.append(
                f"{n_over} nonzero residuals past the significance-split "
                "per-lane cap coerced to zero"
            )
        msg = "device-coded encoder would lose information: " + "; ".join(
            detail
        )
        if self.on_coding_loss == "raise":
            raise CodingLossError(msg)
        warnings.warn(
            msg
            + (
                " — falling back to the lossless host-coder path"
                if self.on_coding_loss == "fallback"
                else " — output will be reconstructed incorrectly"
            ),
            RuntimeWarning,
            stacklevel=3,
        )
        return n

    def _split_capv(self, x: jax.Array):
        """Static per-lane nonzero budget for the split value planes at
        this input geometry. Returns 0 (in-model T/2 default), an int
        (uniform budget), or a per-slice tuple (container v4) when
        split_cap_frac is a sequence — autotune sizes each slice from its
        own significance rate so one dense slice doesn't inflate every
        plane's value scan."""
        frac = self.split_cap_frac
        if not self.coded_split or frac is None:
            return 0
        h, w = int(x.shape[1]), int(x.shape[2])
        n_y = (h // 16) * (w // 16) * self.model.slice_ch
        ts = -(-n_y // self.coded_lanes)

        def _cap(f: float) -> int:
            # 0.5 keeps the 0 sentinel (in-model T/2 default); fracs above
            # it (split_cap_max_frac > 0.5 configs) become explicit caps up
            # to the full lane length
            if abs(f - 0.5) < 5e-4:
                return 0
            return max(8, min(ts, int(ts * f)))

        if isinstance(frac, (list, tuple)):
            if not self.coded_interleave:
                # container v4/v6 implies the interleaved layout; legacy
                # contiguous mode falls back to one uniform budget
                return _cap(max(frac))
            return tuple(_cap(f) for f in frac)
        return _cap(frac)

    # -- device-coded container framing --

    def _pack_blob(
        self,
        states_row: np.ndarray,
        counts_row: np.ndarray,
        words: np.ndarray,
        split: bool,
        q: float = 0.0,
        has_prog: bool = False,
        capv=0,
        sidecar=None,
        interleave: bool = True,
    ) -> bytes:
        flags = (
            (1 if split else 0)
            | (2 if has_prog else 0)
            | (4 if sidecar is not None else 0)
        )
        if counts_row.size and int(counts_row.max()) > 0xFFFF:
            raise CodedStreamError(
                "per-lane word count exceeds the u16 container field — "
                "increase coded_lanes (shorter lanes) for this payload"
            )
        per_plane = isinstance(capv, tuple)
        packed_counts = bool(self.container_packed_counts)
        rice_sc = bool(self.container_rice_sidecar)
        tight = bool(self.container_tight_header)
        if packed_counts or rice_sc or tight:
            # v6: v5-style flag bits on a per-image blob — bit3 per-plane
            # caps block, bit4 contiguous layout, bit5 width-packed
            # counts, bit6 Rice-coded sidecar, bit7 tight lane header
            # (rate: tools/rate_budget.py)
            ver = 6
            flags |= (
                (8 if per_plane else 0)
                | (0 if interleave else 16)
                | (32 if packed_counts and not tight else 0)
                | (64 if rice_sc else 0)
                | (128 if tight else 0)
            )
            caps_block = (
                struct.pack("<H", len(capv))
                + np.asarray(capv, "<u2").tobytes()
                if per_plane
                else b""
            )
            hdr_capv = 0 if per_plane else int(capv)
        elif per_plane:  # v4: per-plane value caps follow the base header
            ver = 4
            caps_block = struct.pack("<H", len(capv)) + np.asarray(
                capv, "<u2"
            ).tobytes()
            hdr_capv = 0
        else:
            ver = _BLOB_VERSION if interleave else 2  # v2 = contiguous
            caps_block = b""
            hdr_capv = int(capv)
        if ver == 6 and tight:
            lane_block = _pack_lane_header(states_row, counts_row)
        else:
            counts_block = (
                _pack_counts(counts_row)
                if ver == 6 and packed_counts
                else counts_row.astype("<u2").tobytes()
            )
            lane_block = states_row.astype("<u4").tobytes() + counts_block
        blob = (
            _BLOB_HEADER.pack(
                _BLOB_MAGIC, ver, flags, 0,
                states_row.shape[0], hdr_capv, float(q),
            )
            + caps_block
            + lane_block
            + words.astype("<u2").tobytes()
        )
        if sidecar is not None:
            pos, dval = sidecar
            if ver == 6 and rice_sc:
                blob += struct.pack("<I", len(pos)) + _rice_encode_sidecar(
                    pos, dval
                )
            elif interleave:  # v3: compact escape-coded sidecar (~3 B/entry)
                blob += struct.pack("<I", len(pos)) + self._pack_sidecar(
                    np.asarray(pos, np.int64), np.asarray(dval, np.int64)
                )
            else:
                # v1/v2 raw sidecar: [u32 n][n x u32 pos][n x i32 delta]
                blob += (
                    struct.pack("<I", len(pos))
                    + pos.astype("<u4").tobytes()
                    + dval.astype("<i4").tobytes()
                )
        return blob

    @staticmethod
    def _pack_sidecar(pos: np.ndarray, dval: np.ndarray) -> bytes:
        """v3 sidecar: positions are strictly increasing, so store u16
        FIRST-DIFFERENCES (token 0xFFFF escapes to a u4 absolute), and
        value deltas as i8 tokens (token -128 escapes to an i4) —
        ~3 B/entry vs the raw format's 8. Outliers are CDF-support
        clamps, dominated by heavy-tail residuals of undertrained or
        off-distribution content; the host coder escapes these at a few
        bits, so the sidecar must not cost 64."""
        dp = np.diff(pos, prepend=np.int64(0))
        big_p = dp >= 0xFFFF
        ptok = np.where(big_p, 0xFFFF, dp).astype("<u2")
        pext = dp[big_p].astype("<u4")
        big_v = (dval < -127) | (dval > 127)
        vtok = np.where(big_v, -128, dval).astype("<i1")
        vext = dval[big_v].astype("<i4")
        return (
            ptok.tobytes() + pext.tobytes() + vtok.tobytes() + vext.tobytes()
        )

    @staticmethod
    def _parse_sidecar(blob: bytes, off: int, n: int):
        """Inverse of _pack_sidecar; returns ((pos, dval), bytes_read)."""
        ptok = np.frombuffer(blob, "<u2", n, offset=off)
        off2 = off + 2 * n
        kp = int(np.count_nonzero(ptok == 0xFFFF))
        if len(blob) < off2 + 4 * kp + n:
            raise CodedStreamError("blob truncated inside the sidecar")
        pext = np.frombuffer(blob, "<u4", kp, offset=off2)
        off2 += 4 * kp
        dp = ptok.astype(np.int64)
        if kp:
            dp[dp == 0xFFFF] = pext.astype(np.int64)
        pos = np.cumsum(dp)
        vtok = np.frombuffer(blob, "<i1", n, offset=off2)
        off2 += n
        kv = int(np.count_nonzero(vtok == -128))
        if len(blob) < off2 + 4 * kv:
            raise CodedStreamError("blob truncated inside the sidecar")
        vext = np.frombuffer(blob, "<i4", kv, offset=off2)
        off2 += 4 * kv
        dval = vtok.astype(np.int64)
        if kv:
            dval[dval == -128] = vext.astype(np.int64)
        return (
            pos.astype(np.int32),
            dval.astype(np.int32),
        ), off2 - off

    def _pack_batch_blob(
        self,
        states: np.ndarray,
        counts: np.ndarray,
        lane_words: Sequence[np.ndarray],
        split: bool,
        q: float = 0.0,
        has_prog: bool = False,
        capv=0,
        sidecars: Optional[Sequence] = None,
        interleave: bool = True,
    ) -> bytes:
        """Container v5: one blob for the whole batch (module docstring)."""
        b, lanes = states.shape
        if b > 255:
            raise CodedStreamError(
                f"batch container holds at most 255 images (got {b}) — "
                "split the batch or use per-image blobs"
            )
        if counts.size and int(counts.max()) > 0xFFFF:
            raise CodedStreamError(
                "per-lane word count exceeds the u16 container field — "
                "increase coded_lanes (shorter lanes) for this payload"
            )
        has_sc = sidecars is not None and any(
            s is not None for s in sidecars
        )
        per_plane = isinstance(capv, tuple)
        packed_counts = bool(self.container_packed_counts)
        rice_sc = bool(self.container_rice_sidecar)
        tight = bool(self.container_tight_header)
        flags = (
            (1 if split else 0)
            | (2 if has_prog else 0)
            | (4 if has_sc else 0)
            | (8 if per_plane else 0)
            | (0 if interleave else 16)
            | (32 if packed_counts and not tight else 0)
            | (64 if rice_sc else 0)
            | (128 if tight else 0)
        )
        if per_plane:
            caps_block = struct.pack("<H", len(capv)) + np.asarray(
                capv, "<u2"
            ).tobytes()
            hdr_capv = 0
        else:
            caps_block = b""
            hdr_capv = int(capv)
        if tight:
            lane_block = _pack_lane_header(states, counts)
        else:
            counts_block = (
                _pack_counts(counts)
                if packed_counts
                else counts.astype("<u2").tobytes()
            )
            lane_block = states.astype("<u4").tobytes() + counts_block
        parts = [
            _BLOB_HEADER.pack(
                _BLOB_MAGIC, 5, flags, b, lanes, hdr_capv, float(q)
            ),
            caps_block,
            lane_block,
        ]
        parts.extend(w.astype("<u2").tobytes() for w in lane_words)
        if has_sc:
            pack_one = (
                _rice_encode_sidecar
                if rice_sc
                else lambda p, d: self._pack_sidecar(
                    np.asarray(p, np.int64), np.asarray(d, np.int64)
                )
            )
            packed = [
                pack_one(s[0], s[1]) if s is not None else b""
                for s in sidecars
            ]
            ns = np.asarray(
                [len(s[0]) if s is not None else 0 for s in sidecars], "<u4"
            )
            parts.append(ns.tobytes())
            parts.extend(packed)
        return b"".join(parts)

    @classmethod
    def _parse_batch_blob(cls, blob: bytes) -> Dict[str, Any]:
        """Parse a v5 batch container to the same dict _parse_blobs
        returns for a list of per-image blobs."""
        hs = _BLOB_HEADER.size
        magic, ver, flags, b, lanes, capv, q = _BLOB_HEADER.unpack(blob[:hs])
        assert magic == _BLOB_MAGIC and ver == 5  # caller dispatched on these
        if b == 0:
            raise CodedStreamError("batch container with batch size 0")
        capv_out: Any = int(capv)
        if flags & 8:  # per-plane caps block
            if len(blob) < hs + 2:
                raise CodedStreamError("blob truncated before the caps block")
            (ncaps,) = struct.unpack_from("<H", blob, hs)
            if len(blob) < hs + 2 + 2 * ncaps:
                raise CodedStreamError("blob truncated inside the caps block")
            capv_out = tuple(
                int(v)
                for v in np.frombuffer(blob, "<u2", ncaps, offset=hs + 2)
            )
            hs += 2 + 2 * ncaps
        if flags & 128:  # tight lane header
            (states_f, counts64), nread = _parse_lane_header(
                blob, hs, b * lanes
            )
            states = states_f.reshape(b, lanes).astype(np.uint32)
            counts = counts64.reshape(b, lanes).astype(np.int32)
            woff = hs + nread
        else:
            if len(blob) < hs + 4 * b * lanes:
                raise CodedStreamError(
                    "blob truncated before the lane header"
                )
            states = (
                np.frombuffer(blob, "<u4", b * lanes, offset=hs)
                .reshape(b, lanes)
                .astype(np.uint32)
            )
            coff = hs + 4 * b * lanes
            if flags & 32:  # width-packed counts block
                counts64, nread = _parse_counts(blob, coff, b * lanes)
                counts = counts64.reshape(b, lanes).astype(np.int32)
                woff = coff + nread
            else:
                if len(blob) < coff + 2 * b * lanes:
                    raise CodedStreamError(
                        "blob truncated before the lane header"
                    )
                counts = (
                    np.frombuffer(blob, "<u2", b * lanes, offset=coff)
                    .reshape(b, lanes)
                    .astype(np.int32)
                )
                woff = coff + 2 * b * lanes
        n_words = int(counts.sum())
        if len(blob) < woff + 2 * n_words:
            raise CodedStreamError("blob truncated inside the word stream")
        flat = np.frombuffer(blob, "<u2", n_words, offset=woff)
        sidecar = None
        if flags & 4:
            soff = woff + 2 * n_words
            if len(blob) < soff + 4 * b:
                raise CodedStreamError("blob truncated before the sidecar")
            ns = np.frombuffer(blob, "<u4", b, offset=soff)
            soff += 4 * b
            omax = int(ns.max()) if b else 0
            K = max(16, 1 << max(omax - 1, 0).bit_length())
            pos = np.full((b, K), np.int32(1 << 30), np.int32)
            dval = np.zeros((b, K), np.int32)
            parse_one = (
                _rice_decode_sidecar if flags & 64 else cls._parse_sidecar
            )
            for i in range(b):
                n_i = int(ns[i])
                if n_i:
                    (op, od), nread = parse_one(blob, soff, n_i)
                    pos[i, :n_i] = op
                    dval[i, :n_i] = od
                    soff += nread
            sidecar = (pos, dval)
        return {
            "split": bool(flags & 1),
            "has_prog": bool(flags & 2),
            "lanes": int(lanes),
            "capv": capv_out,
            "q": float(q),
            "interleave": not (flags & 16),
            "states": states,
            "counts": counts,
            "flat": flat,
            "batch": int(b),
            "L": int(lanes),
            "sidecar": sidecar,
        }

    @staticmethod
    def _parse_blob(blob: bytes) -> Dict[str, Any]:
        hs = _BLOB_HEADER.size
        if len(blob) < hs:
            raise CodedStreamError(
                f"blob too short for a device-ans header ({len(blob)} bytes)"
            )
        magic, ver, flags, _, lanes, capv, q = _BLOB_HEADER.unpack(blob[:hs])
        if magic != _BLOB_MAGIC:
            raise CodedStreamError(
                f"bad magic 0x{magic:02X} (expected 0x{_BLOB_MAGIC:02X}) — "
                "not a device-ans blob (host-coder streams decode via "
                "decompress())"
            )
        if ver == 5:
            raise CodedStreamError(
                "version-5 batch containers hold the whole batch in one "
                "blob — pass it as the single element of strings[0]"
            )
        if ver not in (1, 2, 3, 4, 6):
            raise CodedStreamError(
                f"unsupported device-ans container version {ver} "
                "(this build reads versions 1-6)"
            )
        capv_out = int(capv)
        has_caps = ver == 4 or (ver == 6 and flags & 8)
        if has_caps:  # per-plane value caps follow the base header
            if len(blob) < hs + 2:
                raise CodedStreamError("blob truncated before the caps block")
            (ncaps,) = struct.unpack_from("<H", blob, hs)
            if len(blob) < hs + 2 + 2 * ncaps:
                raise CodedStreamError("blob truncated inside the caps block")
            capv_out = tuple(
                int(v) for v in np.frombuffer(blob, "<u2", ncaps, offset=hs + 2)
            )
            hs += 2 + 2 * ncaps
        if ver == 6 and flags & 128:  # tight lane header
            (states, counts64), nread = _parse_lane_header(blob, hs, lanes)
            counts = counts64.astype(np.uint32)
            woff = hs + nread
        else:
            if len(blob) < hs + 4 * lanes:
                raise CodedStreamError(
                    "blob truncated before the lane header"
                )
            states = np.frombuffer(blob, "<u4", lanes, offset=hs)
            coff = hs + 4 * lanes
            if ver == 6 and flags & 32:  # width-packed counts block
                counts64, nread = _parse_counts(blob, coff, lanes)
                counts = counts64.astype(np.uint32)
                woff = coff + nread
            else:
                cw = 4 if ver == 1 else 2  # v1 stored u4 lane counts
                if len(blob) < coff + cw * lanes:
                    raise CodedStreamError(
                        "blob truncated before the lane header"
                    )
                counts = np.frombuffer(
                    blob, f"<u{cw}", lanes, offset=coff
                ).astype(np.uint32)
                woff = coff + cw * lanes
        n_words = int(counts.sum())
        if len(blob) < woff + 2 * n_words:
            raise CodedStreamError("blob truncated inside the word stream")
        out = {
            "split": bool(flags & 1),
            "has_prog": bool(flags & 2),
            "lanes": int(lanes),
            "capv": capv_out,  # int, or per-plane tuple for v4/v6 blobs
            "q": float(q),
            # v3+ = strided lane layout; v6 carries it in flag bit4
            "interleave": (not (flags & 16)) if ver == 6 else ver >= 3,
            "states": states,
            "counts": counts,
            "words": np.frombuffer(blob, "<u2", n_words, offset=woff),
            "outliers": None,
        }
        if flags & 4:  # lossless outlier sidecar
            soff = woff + 2 * n_words
            if len(blob) < soff + 4:
                raise CodedStreamError("blob truncated before the sidecar")
            (n_out,) = struct.unpack_from("<I", blob, soff)
            if ver == 6 and flags & 64:  # Rice-coded sidecar
                out["outliers"], _ = _rice_decode_sidecar(
                    blob, soff + 4, n_out
                )
            elif ver >= 3:  # compact escape-coded sidecar
                if len(blob) < soff + 4 + 3 * n_out:
                    raise CodedStreamError(
                        "blob truncated inside the sidecar"
                    )
                out["outliers"], _ = WACNNCodec._parse_sidecar(
                    blob, soff + 4, n_out
                )
            else:  # v1/v2 raw [n x u4 pos][n x i4 delta]
                if len(blob) < soff + 4 + 8 * n_out:
                    raise CodedStreamError(
                        "blob truncated inside the sidecar"
                    )
                out["outliers"] = (
                    np.frombuffer(
                        blob, "<u4", n_out, offset=soff + 4
                    ).astype(np.int32),
                    np.frombuffer(
                        blob, "<i4", n_out, offset=soff + 4 + 4 * n_out
                    ),
                )
        return out

    @classmethod
    def _parse_blobs(cls, blobs: Sequence[bytes]) -> Dict[str, Any]:
        """Parse a batch of blobs; headers must agree across the batch.
        A single v5 batch container is detected and parsed directly."""
        if (
            len(blobs) == 1
            and len(blobs[0]) >= 2
            and blobs[0][0] == _BLOB_MAGIC
            and blobs[0][1] == 5
        ):
            return cls._parse_batch_blob(blobs[0])
        parsed = [cls._parse_blob(s) for s in blobs]
        h0 = {
            k: parsed[0][k]
            for k in ("split", "has_prog", "lanes", "capv", "q", "interleave")
        }
        for p in parsed[1:]:
            for k, v in h0.items():
                if p[k] != v:
                    raise CodedStreamError(
                        f"inconsistent {k} across the batch's blob headers"
                    )
        L = h0["lanes"]
        b = len(parsed)
        states = np.stack([p["states"] for p in parsed]).astype(np.uint32)
        counts = np.stack([p["counts"] for p in parsed]).astype(np.int32)
        flat = (
            np.concatenate([p["words"] for p in parsed])
            if b
            else np.zeros(0, np.uint16)
        )
        # batch the per-image sidecars to a shared static width (bucketed);
        # pad positions far out of range so the decode scatter drops them
        sidecar = None
        if any(p["outliers"] is not None for p in parsed):
            omax = max(
                len(p["outliers"][0]) if p["outliers"] is not None else 0
                for p in parsed
            )
            K = max(16, 1 << max(omax - 1, 0).bit_length())
            pos = np.full((b, K), np.int32(1 << 30), np.int32)
            dval = np.zeros((b, K), np.int32)
            for i, p in enumerate(parsed):
                if p["outliers"] is not None:
                    op, od = p["outliers"]
                    pos[i, : len(op)] = op
                    dval[i, : len(od)] = od
            sidecar = (pos, dval)
        return {**h0, "states": states, "counts": counts, "flat": flat,
                "batch": b, "L": L, "sidecar": sidecar}

    def _check_drained(self, drained) -> None:
        if self.decode_check and not bool(np.asarray(drained)):
            raise CodedStreamError(
                "decoded stream did not drain (lane states/pointers off) — "
                "corrupt blob, mismatched decoder build, or encoder/decoder "
                "compilation divergence; output would be garbage"
            )

    @staticmethod
    def _host_pool_map(fn, n: int) -> list:
        """Run fn(0..n-1) on the shared pool (order-preserving)."""
        if n == 1:
            return [fn(0)]
        return list(_HOST_POOL.map(fn, range(n)))

    # -- table management (reference `update()`, cnn.py:135-140) --

    def update(self, force: bool = False) -> bool:
        if self.eb_table is not None and not force:
            return False
        eb_params = self.params["params"]["entropy_bottleneck"]
        self.eb_table = build_eb_table(eb_params)
        self.gc_table = build_gc_table(self.scale_table)
        self._medians = eb_medians(eb_params)
        # device-side view of the SAME integer tables for the on-device coder
        from ..coding.device_ans import build_device_tables, build_split_tables

        assert self.gc_table.ncdfs == 64, "encode_coded assumes 64 GC rows"
        self.dev_tables, _ = build_device_tables(self.gc_table, self.eb_table)
        cond, p0, center = build_split_tables(self.gc_table)
        self.split_tables = cond
        self._split_consts = (
            tuple(int(v) for v in p0),
            tuple(int(v) for v in center),
            tuple(int(v) for v in self.gc_table.offset),
        )
        return True

    def _check_updated(self):
        if self.eb_table is None:
            raise RuntimeError("Uninitialized CDF tables — call update() first")

    def _check_coder(self, coder) -> None:
        """Validate a compress()-result coder tag against this codec's
        bound host coder (ans | rangecoder). None (untagged legacy /
        reference-produced streams) is accepted for compatibility."""
        if coder is not None and coder != self.coder_name:
            raise CodedStreamError(
                f"bitstream was produced by the '{coder}' entropy coder but "
                f"this codec decodes with '{self.coder_name}' — decoding "
                "would desync; rebind with set_entropy_coder or re-encode"
            )

    # -- encode --

    def compress(self, x: jax.Array, return_debug: bool = False) -> Dict[str, Any]:
        """x: (B, H, W, 3) in [0,1], H and W multiples of 64.

        Fused path: ONE device dispatch computes z/y symbols and indexes;
        the native rANS coder turns them into per-image streams.
        """
        self._check_updated()
        out = self._encode_fn(self.params, x)
        for k in ("z_symbols", "y_symbols", "y_indexes"):
            out[k].copy_to_host_async()
        self._warn_saturation(out)
        z_symbols = np.asarray(out["z_symbols"])
        y_symbols = np.asarray(out["y_symbols"])
        y_indexes = np.asarray(out["y_indexes"])
        b = z_symbols.shape[0]

        z_idx = eb_build_indexes(z_symbols.shape, z_symbols.shape[-1])
        enc = self._enc_cls()
        z_strings = self._host_pool_map(
            lambda i: enc.encode_with_indexes(z_symbols[i], z_idx[i], self.eb_table), b
        )
        y_strings = self._host_pool_map(
            lambda i: enc.encode_with_indexes(y_symbols[i], y_indexes[i], self.gc_table), b
        )
        result = {
            "strings": [y_strings, z_strings],
            "shape": tuple(z_symbols.shape[1:3]),
            "coder": self.coder_name,
        }
        if return_debug:
            result["y_hat"] = out["y_hat"]
        return result

    # -- fully-fused on-device-coded paths --
    #
    # The host-coder paths above move ~2.4 MB of symbols+indexes per
    # 768x512 image across the link and pay one host<->device round trip
    # per decoded slice. These paths run the interleaved rANS coder INSIDE
    # the jitted program (coding/device_ans.py): compress is one dispatch
    # returning actual compressed words; decompress is one dispatch
    # consuming them. Replaces the reference's host decode loop
    # (cnn.py:260-342) with a TPU-resident equivalent.

    @staticmethod
    def _bucket(n: int, lo: int = 4096) -> int:
        return max(lo, 1 << (max(n, 1) - 1).bit_length())

    _dense_prefix_fns: Dict[int, Any] = {}

    @classmethod
    def _dense_prefix(cls, dense: jax.Array, cap_fetch: int) -> jax.Array:
        """Column prefix of the dense word matrix (jit per static width).

        The encoder's word cap is a safety bound (~T/16); real lanes hold
        ~bpp-proportional counts, so fetching only a bucketed prefix cuts
        the dominant d2h volume several-fold for one extra dispatch."""
        fn = cls._dense_prefix_fns.get(cap_fetch)
        if fn is None:
            fn = jax.jit(lambda w: w[:, :cap_fetch])
            cls._dense_prefix_fns[cap_fetch] = fn
        return fn(dense)

    _flatten_fns: Dict[Tuple[int, int], Any] = {}

    def _fetch_lane_words(
        self, words, counts_dev, counts: np.ndarray, b: int, L: int
    ) -> list:
        """Per-image lane-concatenated word arrays via the device-side
        ragged flatten (device_ans.flatten_dense_words): the d2h fetch is
        bucket(total_words) u16 elements instead of a (B*L, cap_fetch)
        rectangle whose padding columns were ~2.7x the true payload at
        trained statistics. Buckets are multiples of 64Ki words so the
        flatten program compiles a handful of variants per geometry."""
        from ..coding.device_ans import flatten_dense_words

        total = int(counts.sum())
        tcap = min(
            max(65536, -(-max(total, 1) // 65536) * 65536),
            int(words.shape[0]) * int(words.shape[1]),
        )
        key = (int(words.shape[0]), int(words.shape[1]), tcap)
        fn = self._flatten_fns.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(flatten_dense_words, tcap=tcap)
            )
            self._flatten_fns[key] = fn
        flat = np.asarray(fn(words, counts_dev))[:total]
        per_image = counts.reshape(b, L).sum(axis=1).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(per_image)))
        return [flat[offs[i] : offs[i + 1]] for i in range(b)]

    def _fetch_outliers(self, out: Dict[str, Any], n_out: np.ndarray, sk: int):
        """Fetch only the occupied prefix of the (B, sidecar_cap) outlier
        arrays — after an overflow re-dispatch sk can be large (power-of-2
        of the worst image) while typical images carry far fewer entries;
        fetching the full padding would dominate d2h on tunnel links."""
        kf = min(self._bucket(int(n_out.max()) if n_out.size else 1, lo=16), sk)
        if kf < sk:
            opos = np.asarray(self._dense_prefix(out["outlier_pos"], kf))
            odel = np.asarray(self._dense_prefix(out["outlier_delta"], kf))
        else:
            opos = np.asarray(out["outlier_pos"])
            odel = np.asarray(out["outlier_delta"])
        return opos, odel

    DEFAULT_SIDECAR_CAP = 512

    def _probe_symbols(self, x: jax.Array, **probe_kw) -> list:
        """Quantized-residual planes for autotune_coded's statistics probe
        (the host-path encode program, shared with compress())."""
        return self._probe(x, **probe_kw)["planes"]

    def _probe(self, x: jax.Array, **probe_kw) -> Dict[str, Any]:
        """One probe encode -> {"planes": [y residual planes],
        "clamps": (B,) per-image count of symbols outside their row's
        coded CDF support}. The clamp counts feed autotune_coded's
        sidecar sizing (every clamped element becomes a sidecar entry)."""
        out = self._encode_fn(self.params, x, **probe_kw)
        for k in ("y_symbols", "y_indexes", "z_symbols"):
            out[k].copy_to_host_async()
        y = np.asarray(out["y_symbols"])
        rows_y = np.asarray(out["y_indexes"]).astype(np.int64)
        z = np.asarray(out["z_symbols"]).astype(np.int64)
        clamps = self._clamp_per_image(
            [(y.astype(np.int64), rows_y)], [(z, 64)]
        )
        return {"planes": [y], "clamps": clamps}

    def _clamp_per_image(self, sym_rows, z_planes) -> np.ndarray:
        """Per-image count of symbols the in-stream coder would clamp.

        sym_rows: list of (symbols, row-id arrays) — e.g. y with its GC
        indexes. z_planes: list of (z symbols, row base) where the row id
        of channel c is base + c (EB rows sit after the 64 GC rows in
        dev_tables; a progressive EB follows the base EB)."""
        off = np.asarray(self.dev_tables.offset).astype(np.int64)
        mx = np.asarray(self.dev_tables.max_sym).astype(np.int64)
        b = sym_rows[0][0].shape[0] if sym_rows else z_planes[0][0].shape[0]
        tot = np.zeros(b, np.int64)
        for sym, rows in sym_rows:
            v = sym - off[rows]
            bad = (v < 0) | (v > mx[rows])
            tot += bad.reshape(b, -1).sum(axis=1)
        for zsym, base in z_planes:
            rows = base + np.arange(zsym.shape[-1], dtype=np.int64)
            rows = np.broadcast_to(rows, zsym.shape)
            v = zsym - off[rows]
            bad = (v < 0) | (v > mx[rows])
            tot += bad.reshape(b, -1).sum(axis=1)
        return tot

    def autotune_coded(self, x: jax.Array, split_threshold: float = 0.30,
                       sigmas: float = 4.0, **probe_kw) -> Dict[str, float]:
        """Size the device-coded budgets from MEASURED symbol statistics.

        The significance-split mode and its per-lane value cap only pay
        off at trained-model sparsity; a cap assumed from one operating
        point silently mis-sizes at another (VERDICT r2 weak #5). One
        probe encode (the already-compiled host-path program) measures
        the per-slice nonzero rates of the quantized residuals, then:

        - ``coded_split`` turns on only when the mean nonzero rate is
          below ``split_threshold`` (dense residuals make the binary
          plane pure overhead);
        - ``split_cap_frac`` carries one budget PER SLICE (container
          v4), each sized from that slice's MEASURED worst per-lane
          nonzero count under the actual lane layout plus a small slot
          margin (``sigmas`` slots). Measured — not a binomial tail
          model: strided lanes align with image rows, so textured bands
          concentrate in single lanes and the model's 4-sigma budget
          left ~1.4k overflow entries per dense image (+0.09 bpp of
          sidecar). Content beyond the probe still recovers losslessly
          via the sidecar.
        - ``coded_word_cap`` is cleared to the in-model default (the
          first compress_coded re-sizes it exactly from the real stream
          if a lane overflows, and persists it);
        - ``sidecar_cap`` is sized from the probe too: per-image CDF
          clamp counts (symbols outside their row's coded support — the
          int8-outlier mass a heavy-tailed checkpoint produces) plus the
          split-cap coercions implied by the chosen per-slice budgets,
          with headroom. This kills the first-call overflow re-dispatch
          (and its recompile) that round 3's bench paid inside the
          committed checkpoint's measured path (VERDICT r3 missing #3).

        Returns the measured statistics (nonzero rates per slice, mean,
        max) for logging.
        """
        self._check_updated()
        probe = self._probe(x, **probe_kw)
        planes = probe["planes"]
        h, w = int(x.shape[1]), int(x.shape[2])
        n_plane = (h // 16) * (w // 16) * self.model.slice_ch
        ts = max(1, -(-n_plane // self.coded_lanes))
        L = self.coded_lanes
        per_slice: list = []
        lane_max: Optional[np.ndarray] = None  # per-slice worst lane count
        lane_cnts: list = []  # per plane: (B, ns, L) per-lane nonzero counts
        s_max = 0.0
        for arr in planes:
            nz = arr != 0
            # (B, ns, h, w, sc): per-(image, slice) rates — the cap must
            # cover the densest single image's densest slice, not the
            # batch average (one textured image otherwise overflows)
            rates = nz.mean(axis=(2, 3, 4), dtype=np.float64)  # (B, ns)
            per_slice.extend(float(v) for v in rates.mean(axis=0))
            if not rates.size:
                continue
            s_max = max(s_max, float(rates.max()))
            # MEASURED per-lane nonzero maxima under the real (strided)
            # lane layout: the binomial tail model underestimates —
            # lanes sample every L-th flat position, which aligns with
            # image rows, so textured bands concentrate in single lanes
            # (a 4-sigma cap left ~1.4k overflow entries per bench
            # image = +0.09 bpp of sidecar). bincount per (image,
            # slice) is exact for the probed content; unseen content
            # still recovers via the lossless sidecar.
            b_, ns_ = rates.shape
            flat = nz.reshape(b_, ns_, -1)
            n_el = flat.shape[-1]
            if self.coded_interleave:
                lane_of = np.arange(n_el, dtype=np.int64) % L
            else:
                lane_of = np.arange(n_el, dtype=np.int64) // ts
            m = np.zeros(ns_, np.int64)
            plane_cnts = np.zeros((b_, ns_, L), np.int64)
            for i in range(ns_):
                cnts = np.stack([
                    np.bincount(lane_of[flat[bi, i]], minlength=L)
                    for bi in range(b_)
                ])  # (B, L) per-(image, lane) nonzero counts
                plane_cnts[:, i] = cnts
                # budget at a high quantile (split_cap_quantile), NOT
                # necessarily the max: the absolute worst lane reaches
                # ~T/2 even on sparse slices (one textured band in one
                # image), but every cap slot costs scan time on EVERY
                # lane while an overflow entry costs ~10 Rice-coded
                # sidecar bits. Rate-sensitive configs set quantile=1.0
                # + split_cap_max_frac=1.0 so dense lanes code fully
                # in-stream.
                m[i] = int(np.quantile(cnts, self.split_cap_quantile))
            lane_cnts.append(plane_cnts)
            lane_max = m if lane_max is None else np.maximum(lane_max, m)
        s_mean = float(np.mean(per_slice)) if per_slice else 0.0

        max_frac = float(self.split_cap_max_frac)

        def _frac(worst: int) -> float:
            # measured worst lane + a small absolute margin; sigmas keeps
            # its legacy meaning as extra slots of headroom
            t = (worst + max(2.0, sigmas)) / ts
            # a budget near T/2 snaps to the in-model default — a
            # 46-of-48 cap saves nothing but pushes every tail symbol of
            # a dense slice into the sidecar
            if max_frac <= 0.5:
                t = 0.5 if t >= 0.45 else t
            return min(max_frac, max(0.05, t))

        # split pays whenever the MEAN rate is low: even a T/2-length
        # value plane halves the decode-side table scan, which runs at
        # the gather throughput floor (A/B at the trained 0.65-bpp
        # point, tools/ab_split_trained.py: dec 32.3 -> 19.6 ms/img
        # with the tail budget clamped to T/2 — one dense slice must
        # not disable the mode the nine sparse ones pay for). Dense
        # mean residuals still turn it off: there the binary plane is
        # pure overhead.
        self.coded_split = bool(s_mean < split_threshold)
        if lane_max is not None:
            # PER-SLICE budgets (container v4): each value plane sized
            # from its own slice's measured worst lane, so the sparse
            # slices' scans stay short next to a dense slice 0
            fracs = [_frac(int(v)) for v in lane_max]
            self.split_cap_frac = (
                fracs[0] if len(set(fracs)) <= 1 else tuple(fracs)
            )
        else:
            self.split_cap_frac = 0.5
        self.coded_word_cap = None
        sidecar_need = 0
        if self.sidecar_cap:  # respect an explicit 0 (sidecar disabled)
            # Per-image sidecar entries the chosen config will produce on
            # this content: CDF-support clamps (measured exactly on the
            # probe symbols) + split-cap coercions (implied by the
            # per-slice budgets against the measured per-lane counts).
            coerce = np.zeros_like(probe["clamps"])
            if self.coded_split and lane_cnts:
                fr = self.split_cap_frac
                for plane_cnts in lane_cnts:
                    ns_ = plane_cnts.shape[1]
                    for i in range(ns_):
                        f = fr[i] if isinstance(fr, tuple) else fr
                        # mirror _split_capv's mapping exactly
                        slots = (
                            max(8, ts // 2)
                            if f is None or abs(f - 0.5) < 5e-4
                            else max(8, min(ts, int(ts * f)))
                        )
                        over = plane_cnts[:, i] - slots
                        coerce += np.maximum(over, 0).sum(axis=1)
            per_img = probe["clamps"] + coerce
            sidecar_need = int(per_img.max()) if per_img.size else 0
            # headroom for content denser than the probe; the overflow
            # re-dispatch in compress_coded remains as a lossless backstop
            self.sidecar_cap = self._bucket(
                max(int(sidecar_need * 1.25) + 32, self.DEFAULT_SIDECAR_CAP),
                lo=16,
            )
        return {
            "nonzero_rate_per_slice": per_slice,
            "nonzero_rate_mean": s_mean,
            "nonzero_rate_max": s_max,
            "coded_split": self.coded_split,
            "split_cap_frac": self.split_cap_frac,
            "sidecar_need_max": sidecar_need,
            "sidecar_cap": self.sidecar_cap,
        }

    def compress_coded(self, x: jax.Array, return_debug: bool = False) -> Dict[str, Any]:
        """One-dispatch encoder with on-device entropy coding.

        Emits self-describing per-image blobs (see module docstring). Not
        CompressAI-format — the interleaved-lane stream is this
        framework's own device format (the host-coder compress() keeps
        reference compatibility). If the device coder would lose
        information, the on_coding_loss policy applies (default:
        transparent fallback to the lossless host coder — the returned
        container is then reference-format and decompress_coded
        auto-detects it).
        """
        self._check_updated()
        L = self.coded_lanes
        split = self.coded_split
        capv = self._split_capv(x)
        skw = (
            dict(
                split_tables=self.split_tables,
                split_consts=self._split_consts,
                split_capv=capv,
            )
            if split
            else {}
        )
        if self.coded_word_cap:
            skw["cap"] = int(self.coded_word_cap)
        skw["interleave"] = ilv = bool(self.coded_interleave)
        sk = int(self.sidecar_cap or 0)
        x = self._place_batch(x)
        out = self._encode_coded_fn(
            self.params, x, self.dev_tables, lanes=L, sidecar_cap=sk, **skw
        )
        for k in ("counts", "states", "n_clamped", "n_overflow", "n_bad_rows"):
            out[k].copy_to_host_async()
        if sk:
            # clamp/overflow are recovered losslessly via the sidecar; only
            # a per-image outlier count above the static budget needs a
            # re-dispatch (exact, so the retry always fits)
            self._check_bad_rows(out)
            n_out = np.asarray(out["n_outliers"])
            omax = int(n_out.max()) if n_out.size else 0
            if omax > sk:
                sk = self._bucket(omax, lo=16)
                warnings.warn(
                    f"outlier sidecar overflow ({omax} > {self.sidecar_cap}); "
                    f"re-dispatching with sidecar_cap={sk}",
                    RuntimeWarning,
                )
                out = self._encode_coded_fn(
                    self.params, x, self.dev_tables, lanes=L,
                    sidecar_cap=sk, **skw
                )
                n_out = np.asarray(out["n_outliers"])
                self.sidecar_cap = sk  # persist: steady state = 1 dispatch
        elif self._coding_loss(out) and self.on_coding_loss == "fallback":
            result = self.compress(x, return_debug=return_debug)
            result["format"] = "host"
            return result
        counts = np.asarray(out["counts"]).astype(np.uint32)
        states = np.asarray(out["states"]).astype(np.uint32)
        cap = out["words"].shape[1]
        cmax = int(counts.max()) if counts.size else 0
        if cmax > cap:
            # rare: a lane overflowed the default word cap — re-dispatch at
            # the next power of two (recompiles once per new cap)
            cap2 = 1 << (cmax - 1).bit_length()
            warnings.warn(
                f"encode_coded lane overflow ({cmax} > {cap}); "
                f"re-dispatching with cap={cap2}",
                RuntimeWarning,
            )
            skw.pop("cap", None)
            out = self._encode_coded_fn(
                self.params, x, self.dev_tables, lanes=L, cap=cap2,
                sidecar_cap=sk, **skw,
            )
            counts = np.asarray(out["counts"]).astype(np.uint32)
            states = np.asarray(out["states"]).astype(np.uint32)
            cap = int(out["words"].shape[1])
            cmax = int(counts.max()) if counts.size else 0
            self.coded_word_cap = cap  # persist: steady state = 1 dispatch
            if sk:
                n_out = np.asarray(out["n_outliers"])
        b = counts.shape[0]
        lane_words = self._fetch_lane_words(
            out["words"], out["counts"], counts, b, L
        )
        if sk:
            opos, odel = self._fetch_outliers(out, n_out, sk)
            sidecars = [
                (opos[i, : n_out[i]], odel[i, : n_out[i]]) for i in range(b)
            ]
        else:
            sidecars = [None] * b
        if self.coded_batch_container and b > 1:
            strings = [
                self._pack_batch_blob(
                    states, counts, lane_words, split, capv=capv,
                    sidecars=sidecars, interleave=ilv,
                )
            ]
        else:
            strings = [
                self._pack_blob(
                    states[i], counts[i], lane_words[i], split, capv=capv,
                    sidecar=sidecars[i], interleave=ilv,
                )
                for i in range(b)
            ]
        zh, zw = out["y_hat"].shape[1] // 4, out["y_hat"].shape[2] // 4
        result: Dict[str, Any] = {
            "strings": [strings],
            "shape": (zh, zw),
            "format": "device-ans",
        }
        if return_debug:
            result["y_hat"] = out["y_hat"]
        return result

    def decompress_coded(self, strings, shape, coder=None) -> Dict[str, Any]:
        """One-dispatch decoder: device rANS + slice loop + synthesis.

        Self-configures from the blob headers (lanes / split mode); a
        host-format container (on_coding_loss fallback) is auto-detected
        and routed through the lossless host decode. After decoding, the
        drained-stream invariant is verified (decode_check) so a desynced
        stream raises CodedStreamError instead of returning garbage.
        """
        self._check_updated()
        if len(strings) >= 2:  # host-coder fallback container
            return self.decompress(
                strings, shape, return_debug=True, coder=coder
            )
        hdr = self._parse_blobs(strings[0])
        b, L = hdr["batch"], hdr["L"]
        counts, states, flat = hdr["counts"], hdr["states"], hdr["flat"]
        padded = np.zeros(self._bucket(len(flat)), np.uint16)
        padded[: len(flat)] = flat

        c = getattr(self.model, "hyper_ch", None) or self.model.N
        skw = (
            dict(
                split_tables=self.split_tables,
                split_consts=self._split_consts,
                split_capv=hdr["capv"],
            )
            if hdr["split"]
            else {}
        )
        if hdr["sidecar"] is not None:
            skw["outlier_pos"] = self._place_batch(
                jnp.asarray(hdr["sidecar"][0]), b
            )
            skw["outlier_delta"] = self._place_batch(
                jnp.asarray(hdr["sidecar"][1]), b
            )
        x_hat, y_hat, drained = self._decode_coded_fn(
            self.params,
            self._place_replicated(padded),
            self._place_batch(jnp.asarray(counts), b),
            self._place_batch(jnp.asarray(states), b),
            self.dev_tables,
            z_shape=(b, shape[0], shape[1], c),
            lanes=L,
            cap=self._bucket(int(counts.max()) if counts.size else 1, lo=32),
            interleave=hdr["interleave"],
            **skw,
        )
        self._check_drained(drained)
        return {"x_hat": x_hat, "y_hat": y_hat}

    def selftest_coded(self, x: jax.Array) -> bool:
        """Encoder/decoder program bit-identity check for the coded path
        (the determinism contract: both programs recompute mu/scale/rows
        from z_hat; see wacnn.py decode_coded docstring)."""
        out = self.compress_coded(x, return_debug=True)
        rec = self.decompress_coded(out["strings"], out["shape"])
        return bool(jnp.all(out["y_hat"] == rec["y_hat"]))

    def compress_stepped(
        self, x: jax.Array, return_debug: bool = False
    ) -> Dict[str, Any]:
        """Stepped reference path: drives the SAME shared device programs as
        decompress() slice by slice. Used by selftest() to validate the fused
        path's bit-exactness on the current backend."""
        self._check_updated()
        y, z_symbols_dev = self._analyze_fn(self.params, x)
        z_symbols = np.asarray(z_symbols_dev)
        b = z_symbols.shape[0]

        # z_hat exactly as the decoder will rebuild it (host add, then device)
        z_hat = jnp.asarray(z_symbols.astype(np.float32) + self._medians)
        latent_means, latent_scales = self._hyper_fn(self.params, z_hat)

        y_hat_slices: List[jax.Array] = []
        sym_slices, idx_slices = [], []
        for i in range(self.model.num_slices):
            support = tuple(y_hat_slices[: self.model.max_support_slices])
            mu, _, indexes = self._slice_params_fn(
                self.params,
                slice_index=i,
                latent_means=latent_means,
                latent_scales=latent_scales,
                support=support,
            )
            syms = self._quantize_fn(self.params, slice_index=i, y=y, mu=mu)
            sym_slices.append(syms)
            idx_slices.append(indexes)
            y_hat_slices.append(
                self._slice_rec_fn(
                    self.params,
                    slice_index=i,
                    symbols=syms,
                    mu=mu,
                    latent_means=latent_means,
                    support=support,
                )
            )

        # slice-major symbol order (slice 0 fully, then slice 1, ...) — must
        # match the decoder's per-slice decode_stream sequence
        y_symbols = np.asarray(jnp.stack(sym_slices, axis=1))
        y_indexes = np.asarray(jnp.stack(idx_slices, axis=1))

        z_idx = eb_build_indexes(z_symbols.shape, z_symbols.shape[-1])
        enc = self._enc_cls()
        z_strings = [
            enc.encode_with_indexes(z_symbols[i], z_idx[i], self.eb_table)
            for i in range(b)
        ]
        y_strings = [
            enc.encode_with_indexes(y_symbols[i], y_indexes[i], self.gc_table)
            for i in range(b)
        ]
        out = {
            "strings": [y_strings, z_strings],
            "shape": tuple(z_symbols.shape[1:3]),
        }
        if return_debug:
            out["y_hat"] = jnp.concatenate(y_hat_slices, axis=-1)
        return out

    # -- decode --

    def _decode_z(self, z_strings: Sequence[bytes], shape) -> jax.Array:
        zh, zw = shape
        c = getattr(self.model, "hyper_ch", self.model.N)
        z_idx = eb_build_indexes((1, zh, zw, c), c)[0]
        dec = self._dec_cls()
        outs = [
            dec.decode_with_indexes(s, z_idx, self.eb_table).reshape(zh, zw, c)
            for s in z_strings
        ]
        z_sym = np.stack(outs).astype(np.float32)
        return jnp.asarray(z_sym + self._medians)

    def decompress(
        self, strings, shape, return_debug: bool = False, coder=None
    ) -> Dict[str, Any]:
        """Fused path: decode_begin + (num_slices-1) decode_steps +
        decode_end — one dispatch per slice instead of two, with the native
        rANS decode interleaved on the host.

        Link-bound tuning (dominant on tunneled TPUs, still free locally):
          * index fetches are issued with copy_to_host_async right after the
            producing dispatch, so the d2h overlaps the step's own compute;
          * decoded symbols upload as int8 (they are int8-range clamped by
            the encoder), quartering the per-slice h2d volume;
          * per-image rANS decode fans out over a thread pool (the ctypes
            calls release the GIL).
        """
        self._check_updated()
        self._check_coder(coder)
        y_strings, z_strings = strings[0], strings[1]
        z_hat = self._decode_z(z_strings, shape)

        b = z_hat.shape[0]
        yh, yw = shape[0] * 4, shape[1] * 4
        sc = self.model.slice_ch
        ns = self.model.num_slices

        decoders = []
        for s in y_strings:
            d = self._dec_cls()
            d.set_stream(s)
            decoders.append(d)

        latent_means, latent_scales, mu, indexes = self._decode_begin_fn(
            self.params, z_hat
        )
        indexes.copy_to_host_async()

        def decode_syms(idx_dev):
            idx_np = np.asarray(idx_dev)
            outs = self._host_pool_map(
                lambda j: decoders[j].decode_stream(idx_np[j], self.gc_table),
                b,
            )
            return jnp.asarray(
                np.stack(outs).astype(np.int8).reshape(b, yh, yw, sc)
            )

        slices: List[jax.Array] = []
        for i in range(ns - 1):
            syms = decode_syms(indexes)
            y_prev, mu, indexes = self._decode_step_fn(
                self.params,
                slice_index=i + 1,
                symbols_prev=syms,
                mu_prev=mu,
                latent_means=latent_means,
                latent_scales=latent_scales,
                support=tuple(slices[: self.model.max_support_slices]),
            )
            indexes.copy_to_host_async()
            slices.append(y_prev)

        syms = decode_syms(indexes)
        x_hat, y_hat = self._decode_end_fn(
            self.params,
            symbols=syms,
            mu=mu,
            latent_means=latent_means,
            slices=tuple(slices),
        )
        out = {"x_hat": x_hat}
        if return_debug:
            out["y_hat"] = y_hat
        return out

    def selftest(self, x: jax.Array, require_stream_equality: bool = True) -> None:
        """Verify the codec's cross-program determinism contract on the
        CURRENT backend (fusion-context numerics are empirical).

        Two layers:
          1. REQUIRED (the correctness contract): decompress(compress(x))
             reproduces the fused encoder's own y_hat bit-exactly — i.e.
             the decoder-side recompute (hyper synthesis, slice mu/scale,
             LRP) matches the encoder that produced the stream.
          2. STRICT (require_stream_equality): the fused and stepped
             encoders emit byte-identical streams. This additionally
             requires the ENCODER-private transforms (g_a, h_a) to be
             bit-identical across separately compiled programs. WACNN's
             conv/GDN encoder satisfies it on TPU; TCM's strided-conv
             swin encoder can differ by ulps between programs, producing
             a different but equally valid stream — pass False there
             (layer 1 still fully validates correctness).
        """
        fused = self.compress(x, return_debug=True)
        if require_stream_equality:
            stepped = self.compress_stepped(x, return_debug=True)
            for a, b in zip(fused["strings"], stepped["strings"]):
                if list(a) != list(b):
                    raise AssertionError("fused/stepped streams differ")
        rec = self.decompress(fused["strings"], fused["shape"], return_debug=True)
        if not np.array_equal(np.asarray(rec["y_hat"]), np.asarray(fused["y_hat"])):
            raise AssertionError("decode did not reproduce encoder latents")


class ScalableCodec(WACNNCodec):
    """Codec driver for the scalable family (shared / independent / …).

    Bitstream contract mirrors the reference (independent.py:611-627):
        q == 0:  strings = [y_strings, z_strings],            shape = [z_hw]
        q != 0:  strings = [y_strings, z_strings, z_strings_prog,
                            progressive_strings],  shape = [z_hw, z_prog_hw]
    progressive_strings is a list over slices, each a list over the batch —
    the per-slice stream structure the reference produces via
    gaussian_conditional_prog.compress (independent.py:589-592).
    """

    def __init__(self, model, params):
        super().__init__(model, params)
        self.eb_prog_table: CdfTable | None = None
        self._analyze_scal_fn = jax.jit(
            functools.partial(model.apply, method="analyze_scalable"),
            static_argnames=("with_prog",),
        )
        self._hyper_prog_fn = jax.jit(
            functools.partial(model.apply, method="hyper_synthesis_prog")
        )
        self._slice_params_prog_fn = jax.jit(
            functools.partial(model.apply, method="slice_params_prog"),
            static_argnames=("slice_index",),
        )
        self._quantize_prog_fn = jax.jit(
            functools.partial(model.apply, method="quantize_slice_prog"),
            static_argnames=("slice_index",),
        )
        self._slice_rec_prog_fn = jax.jit(
            functools.partial(model.apply, method="slice_reconstruct_prog"),
            static_argnames=("slice_index",),
        )
        self._synth_scal_fn = jax.jit(
            functools.partial(model.apply, method="synthesize_scalable"),
            static_argnames=("q_is_zero",),
        )
        self._mask_fn = jax.jit(
            functools.partial(model.apply, method="compute_mask"),
            static_argnames=("q",),
        )
        self._encode_scal_fn = jax.jit(
            functools.partial(model.apply, method="encode_device_scalable"),
            static_argnames=("q",),
        )
        self._decode_begin_scal_fn = jax.jit(
            functools.partial(model.apply, method="decode_begin_scalable"),
            static_argnames=("q",),
        )
        self._decode_step_scal_fn = jax.jit(
            functools.partial(model.apply, method="decode_step_scalable"),
            static_argnames=("slice_index",),
        )
        self._decode_end_scal_fn = jax.jit(
            functools.partial(model.apply, method="decode_end_scalable"),
            static_argnames=("q",),
        )
        self._merge_fn = jax.jit(
            functools.partial(model.apply, method="merge_slices"),
            static_argnames=("slice_index",),
        )
        self._final_latent_fn = jax.jit(
            functools.partial(model.apply, method="final_latent_device"),
            static_argnames=("q_is_zero",),
        )
        self._encode_coded_fn = jax.jit(
            functools.partial(model.apply, method="encode_coded_scalable"),
            static_argnames=(
                "q", "lanes", "cap", "split_consts", "split_capv",
                "sidecar_cap", "interleave",
            ),
        )
        self._decode_coded_fn = jax.jit(
            functools.partial(model.apply, method="decode_coded_scalable"),
            static_argnames=(
                "z_shape", "zp_shape", "q", "lanes", "cap", "split_consts",
                "split_capv", "interleave",
            ),
        )

    def update(self, force: bool = False) -> bool:
        if self.eb_table is not None and not force:
            return False
        p = self.params["params"]
        self.eb_table = build_eb_table(p["entropy_bottleneck"])
        self.eb_prog_table = build_eb_table(p["entropy_bottleneck_prog"])
        self.gc_table = build_gc_table(self.scale_table)
        self._medians = eb_medians(p["entropy_bottleneck"])
        self._medians_prog = eb_medians(p["entropy_bottleneck_prog"])
        from ..coding.device_ans import build_device_tables, build_split_tables

        assert self.gc_table.ncdfs == 64, "coded paths assume 64 GC rows"
        self.dev_tables, _ = build_device_tables(
            self.gc_table, self.eb_table, self.eb_prog_table
        )
        cond, p0, center = build_split_tables(self.gc_table)
        self.split_tables = cond
        self._split_consts = (
            tuple(int(v) for v in p0),
            tuple(int(v) for v in center),
            tuple(int(v) for v in self.gc_table.offset),
        )
        return True

    # -- on-device-coded paths (scalable: one blob carries every plane) --

    def _probe_symbols(self, x: jax.Array, quality=0.0) -> list:
        """Autotune probe at a quality level: base + (q≠0) progressive
        residual planes, both coded by the scalable blob."""
        return self._probe(x, quality=quality)["planes"]

    def _probe(self, x: jax.Array, quality=0.0) -> Dict[str, Any]:
        """Scalable probe: planes + per-image clamp counts over every
        stream the blob carries (y, y_prog, z, z_prog). Both GCs share
        the 64-row scale table; the prog EB's rows follow the base EB's
        in dev_tables (see update())."""
        q = self._normalize_quality(quality)
        out = self._encode_scal_fn(self.params, x, q=q)
        planes = [np.asarray(out["y_symbols"])]
        sym_rows = [(
            planes[0].astype(np.int64),
            np.asarray(out["y_indexes"]).astype(np.int64),
        )]
        if "y_prog_symbols" in out:
            planes.append(np.asarray(out["y_prog_symbols"]))
            sym_rows.append((
                planes[1].astype(np.int64),
                np.asarray(out["y_prog_indexes"]).astype(np.int64),
            ))
        z = np.asarray(out["z_symbols"]).astype(np.int64)
        z_planes = [(z, 64)]
        if "z_prog_symbols" in out:
            zp = np.asarray(out["z_prog_symbols"]).astype(np.int64)
            z_planes.append((zp, 64 + z.shape[-1]))
        clamps = self._clamp_per_image(sym_rows, z_planes)
        return {"planes": planes, "clamps": clamps}

    def compress_coded(
        self, x: jax.Array, quality=0.0, return_debug: bool = False
    ) -> Dict[str, Any]:
        """One-dispatch scalable encoder with on-device entropy coding.

        Single self-describing per-image blob (header, states+counts,
        then words) covering [z, z_prog?, y_i / y_prog_i ...] — the
        scalable host path's 4-part stream collapses into one chained
        lane set. Not reference-format. The on_coding_loss policy applies
        as in WACNNCodec.compress_coded."""
        self._check_updated()
        L = self.coded_lanes
        split = self.coded_split
        q = self._normalize_quality(quality)
        capv = self._split_capv(x)
        skw = (
            dict(
                split_tables=self.split_tables,
                split_consts=self._split_consts,
                split_capv=capv,
            )
            if split
            else {}
        )
        if self.coded_word_cap:
            skw["cap"] = int(self.coded_word_cap)
        skw["interleave"] = ilv = bool(self.coded_interleave)
        sk = int(self.sidecar_cap or 0)
        x = self._place_batch(x)
        out = self._encode_coded_fn(
            self.params, x, self.dev_tables, q=q, lanes=L, sidecar_cap=sk,
            **skw,
        )
        for k in ("counts", "states", "n_clamped", "n_overflow", "n_bad_rows"):
            out[k].copy_to_host_async()
        if sk:
            self._check_bad_rows(out)
            n_out = np.asarray(out["n_outliers"])
            omax = int(n_out.max()) if n_out.size else 0
            if omax > sk:
                sk = self._bucket(omax, lo=16)
                warnings.warn(
                    f"outlier sidecar overflow ({omax} > {self.sidecar_cap}); "
                    f"re-dispatching with sidecar_cap={sk}",
                    RuntimeWarning,
                )
                out = self._encode_coded_fn(
                    self.params, x, self.dev_tables, q=q, lanes=L,
                    sidecar_cap=sk, **skw,
                )
                n_out = np.asarray(out["n_outliers"])
                self.sidecar_cap = sk  # persist: steady state = 1 dispatch
        elif self._coding_loss(out) and self.on_coding_loss == "fallback":
            result = self.compress(
                x, quality=quality, return_debug=return_debug
            )
            result["format"] = "host"
            return result
        counts = np.asarray(out["counts"]).astype(np.uint32)
        states = np.asarray(out["states"]).astype(np.uint32)
        cap = out["words"].shape[1]
        cmax = int(counts.max()) if counts.size else 0
        if cmax > cap:
            cap2 = 1 << (cmax - 1).bit_length()
            warnings.warn(
                f"encode_coded lane overflow ({cmax} > {cap}); "
                f"re-dispatching with cap={cap2}",
                RuntimeWarning,
            )
            skw.pop("cap", None)
            out = self._encode_coded_fn(
                self.params, x, self.dev_tables, q=q, lanes=L, cap=cap2,
                sidecar_cap=sk, **skw,
            )
            counts = np.asarray(out["counts"]).astype(np.uint32)
            states = np.asarray(out["states"]).astype(np.uint32)
            cap = int(out["words"].shape[1])
            cmax = int(counts.max()) if counts.size else 0
            self.coded_word_cap = cap  # persist: steady state = 1 dispatch
            if sk:
                n_out = np.asarray(out["n_outliers"])
        b = counts.shape[0]
        with_prog = out.get("zp_shape") is not None
        lane_words = self._fetch_lane_words(
            out["words"], out["counts"], counts, b, L
        )
        if sk:
            opos, odel = self._fetch_outliers(out, n_out, sk)
            sidecars = [
                (opos[i, : n_out[i]], odel[i, : n_out[i]]) for i in range(b)
            ]
        else:
            sidecars = [None] * b
        if self.coded_batch_container and b > 1:
            strings = [
                self._pack_batch_blob(
                    states, counts, lane_words, split,
                    q=q, has_prog=with_prog, capv=capv, sidecars=sidecars,
                    interleave=ilv,
                )
            ]
        else:
            strings = [
                self._pack_blob(
                    states[i], counts[i], lane_words[i], split,
                    q=q, has_prog=with_prog, capv=capv, sidecar=sidecars[i],
                    interleave=ilv,
                )
                for i in range(b)
            ]
        shape = [tuple(out["z_shape"].shape)]
        if with_prog:
            shape.append(tuple(out["zp_shape"].shape))
        result: Dict[str, Any] = {
            "strings": [strings],
            "shape": shape,
            "format": "device-ans",
        }
        if return_debug:
            result["y_hat"] = out["y_hat"]
        return result

    def decompress_coded(
        self, strings, shape, quality=None, coder=None
    ) -> Dict[str, Any]:
        """Self-configuring scalable coded decode.

        quality=None (default) decodes at the blob header's own quality;
        passing a quality cross-checks it against the header and raises
        CodedStreamError on mismatch (a wrong q shifts the plane sequence
        and would otherwise silently desync the stream)."""
        self._check_updated()
        if len(strings) >= 2:  # host-coder fallback container
            if quality is None:
                if len(strings) > 2:
                    raise ValueError(
                        "host-format scalable container (on_coding_loss "
                        "fallback) carries no quality — pass quality= "
                        "explicitly (reference decompress contract)"
                    )
                quality = 0.0  # 2-part container is base-only by contract
            return self.decompress(
                strings, shape, quality=quality, return_debug=True,
                coder=coder,
            )
        hdr = self._parse_blobs(strings[0])
        q_hdr = hdr["q"]
        q_hdr = int(q_hdr) if float(q_hdr).is_integer() else q_hdr
        if quality is not None:
            q_req = self._normalize_quality(quality)
            if np.float32(q_req) != np.float32(q_hdr):
                raise CodedStreamError(
                    f"requested quality {q_req} does not match the blob "
                    f"header's quality {q_hdr} — decoding would desync"
                )
        q = q_hdr
        if hdr["has_prog"] != (q != 0):
            raise CodedStreamError(
                "blob header's has-prog flag contradicts its quality"
            )
        b, L = hdr["batch"], hdr["L"]
        counts, states, flat = hdr["counts"], hdr["states"], hdr["flat"]
        padded = np.zeros(self._bucket(len(flat)), np.uint16)
        padded[: len(flat)] = flat

        c = getattr(self.model, "hyper_ch", None) or self.model.N
        zh, zw = shape[0]
        if q != 0:
            cp = self.params["params"]["entropy_bottleneck_prog"][
                "quantiles"
            ].shape[0]
            zph, zpw = shape[1]
            zp_shape = (b, zph, zpw, cp)
        else:
            zp_shape = None
        skw = (
            dict(
                split_tables=self.split_tables,
                split_consts=self._split_consts,
                split_capv=hdr["capv"],
            )
            if hdr["split"]
            else {}
        )
        if hdr["sidecar"] is not None:
            skw["outlier_pos"] = self._place_batch(
                jnp.asarray(hdr["sidecar"][0]), b
            )
            skw["outlier_delta"] = self._place_batch(
                jnp.asarray(hdr["sidecar"][1]), b
            )
        x_hat, y_hat, drained = self._decode_coded_fn(
            self.params,
            self._place_replicated(padded),
            self._place_batch(jnp.asarray(counts), b),
            self._place_batch(jnp.asarray(states), b),
            self.dev_tables,
            z_shape=(b, zh, zw, c),
            zp_shape=zp_shape,
            q=q,
            lanes=L,
            cap=self._bucket(int(counts.max()) if counts.size else 1, lo=32),
            interleave=hdr["interleave"],
            **skw,
        )
        self._check_drained(drained)
        return {"x_hat": x_hat, "y_hat": y_hat}

    def selftest_coded(self, x: jax.Array, quality=0.0) -> bool:
        out = self.compress_coded(x, quality=quality, return_debug=True)
        rec = self.decompress_coded(out["strings"], out["shape"], quality=quality)
        return bool(jnp.all(out["y_hat"] == rec["y_hat"]))

    def _normalize_quality(self, quality):
        """Lambda -> level-index mapping, in exactly one place.

        point-based-std consumes the RAW quality as a quantile fraction
        (extract_mask docstring; ref shared.py:197), so index
        normalization must NOT apply — a lambda like 0.065 would
        otherwise arrive as level index 1 and select quantile 0.1
        instead of 0.0065."""
        if getattr(self.model, "mask_policy", None) == "point-based-std":
            return quality
        return self.model.normalize_quality(quality)

    def compress(self, x: jax.Array, quality=0.0, return_debug: bool = False):
        """Fused path: one device dispatch for the full (base+prog) encode."""
        self._check_updated()
        q = self._normalize_quality(quality)
        with_prog = q != 0

        out = self._encode_scal_fn(self.params, x, q=q)
        for k, v in out.items():
            if k != "y_hat":
                v.copy_to_host_async()
        self._warn_saturation(out)
        z_symbols = np.asarray(out["z_symbols"])
        y_symbols = np.asarray(out["y_symbols"])
        y_indexes = np.asarray(out["y_indexes"])
        b = z_symbols.shape[0]

        z_idx = eb_build_indexes(z_symbols.shape, z_symbols.shape[-1])
        enc = self._enc_cls()
        z_strings = self._host_pool_map(
            lambda i: enc.encode_with_indexes(z_symbols[i], z_idx[i], self.eb_table), b
        )
        y_strings = self._host_pool_map(
            lambda i: enc.encode_with_indexes(y_symbols[i], y_indexes[i], self.gc_table), b
        )
        if not with_prog:
            result = {
                "strings": [y_strings, z_strings],
                "shape": [tuple(z_symbols.shape[1:3])],
                "coder": self.coder_name,
            }
            if return_debug:
                result["y_hat"] = out["y_hat"]
            return result

        zp_symbols = np.asarray(out["z_prog_symbols"])
        yp_symbols = np.asarray(out["y_prog_symbols"])
        yp_indexes = np.asarray(out["y_prog_indexes"])
        zp_idx = eb_build_indexes(zp_symbols.shape, zp_symbols.shape[-1])
        z_strings_prog = self._host_pool_map(
            lambda i: enc.encode_with_indexes(zp_symbols[i], zp_idx[i], self.eb_prog_table),
            b,
        )
        ns = self.model.num_slices
        prog_flat = self._host_pool_map(
            lambda k: enc.encode_with_indexes(
                yp_symbols[k % b, k // b], yp_indexes[k % b, k // b], self.gc_table
            ),
            ns * b,
        )
        progressive_strings = [
            [prog_flat[i * b + j] for j in range(b)] for i in range(ns)
        ]
        result = {
            "strings": [y_strings, z_strings, z_strings_prog, progressive_strings],
            "shape": [
                tuple(z_symbols.shape[1:3]),
                tuple(zp_symbols.shape[1:3]),
            ],
            "coder": self.coder_name,
        }
        if return_debug:
            result["y_hat"] = out["y_hat"]
        return result

    def compress_stepped(self, x: jax.Array, quality=0.0, return_debug: bool = False):
        """Stepped reference path (shared per-slice programs); selftest
        validates the fused path against this."""
        self._check_updated()
        q = self._normalize_quality(quality)
        with_prog = q != 0

        out = self._analyze_scal_fn(self.params, x, with_prog=with_prog)
        y = out["y"]
        z_symbols = np.asarray(out["z_symbols"])
        b = z_symbols.shape[0]

        # ---- base branch (same shared-program discipline as WACNNCodec) ----
        z_hat = jnp.asarray(z_symbols.astype(np.float32) + self._medians)
        latent_means, latent_scales = self._hyper_fn(self.params, z_hat)

        y_hat_slices: List[jax.Array] = []
        sym_slices, idx_slices = [], []
        for i in range(self.model.num_slices):
            support = tuple(y_hat_slices[: self.model.max_support_slices])
            mu, _, indexes = self._slice_params_fn(
                self.params, slice_index=i,
                latent_means=latent_means, latent_scales=latent_scales,
                support=support,
            )
            syms = self._quantize_fn(self.params, slice_index=i, y=y, mu=mu)
            sym_slices.append(syms)
            idx_slices.append(indexes)
            y_hat_slices.append(
                self._slice_rec_fn(
                    self.params, slice_index=i, symbols=syms, mu=mu,
                    latent_means=latent_means, support=support,
                )
            )

        y_symbols = np.asarray(jnp.stack(sym_slices, axis=1))
        y_indexes = np.asarray(jnp.stack(idx_slices, axis=1))
        z_idx = eb_build_indexes(z_symbols.shape, z_symbols.shape[-1])
        enc = self._enc_cls()
        z_strings = [
            enc.encode_with_indexes(z_symbols[i], z_idx[i], self.eb_table)
            for i in range(b)
        ]
        y_strings = [
            enc.encode_with_indexes(y_symbols[i], y_indexes[i], self.gc_table)
            for i in range(b)
        ]

        if not with_prog:
            result = {
                "strings": [y_strings, z_strings],
                "shape": [tuple(z_symbols.shape[1:3])],
                "coder": self.coder_name,
            }
            if return_debug:
                result["y_hat"] = jnp.concatenate(y_hat_slices, axis=-1)
            return result

        # ---- progressive branch ----
        y_prog = out["y_prog"]
        z_prog_symbols = np.asarray(out["z_prog_symbols"])
        z_hat_prog = jnp.asarray(
            z_prog_symbols.astype(np.float32) + self._medians_prog
        )
        means_prog, scales_prog = self._hyper_prog_fn(self.params, z_hat_prog)

        zp_idx = eb_build_indexes(z_prog_symbols.shape, z_prog_symbols.shape[-1])
        z_strings_prog = [
            enc.encode_with_indexes(z_prog_symbols[i], zp_idx[i], self.eb_prog_table)
            for i in range(b)
        ]

        mask = None
        if self.model.uses_coding_mask:
            mask = self._mask_fn(
                self.params, latent_scales=latent_scales,
                scales_prog=scales_prog, q=q,
            )
        sc = self.model.slice_ch

        y_hat_prog: List[jax.Array] = []
        progressive_strings: List[List[bytes]] = []
        for i in range(self.model.num_slices):
            support = tuple(y_hat_prog[: self.model.max_support_slices])
            block_mask = (
                mask[..., i * sc : (i + 1) * sc] if mask is not None else None
            )
            mu_p, _, idx_p = self._slice_params_prog_fn(
                self.params, slice_index=i,
                means_prog=means_prog, scales_prog=scales_prog,
                support=support, block_mask=block_mask,
            )
            syms_p = self._quantize_prog_fn(
                self.params, slice_index=i, y_prog=y_prog, mu=mu_p,
                block_mask=block_mask,
            )
            idx_np = np.asarray(idx_p)
            syms_np = np.asarray(syms_p)
            progressive_strings.append(
                [
                    enc.encode_with_indexes(syms_np[j], idx_np[j], self.gc_table)
                    for j in range(b)
                ]
            )
            y_hat_prog.append(
                self._slice_rec_prog_fn(
                    self.params, slice_index=i, symbols=syms_p, mu=mu_p,
                    means_prog=means_prog, support=support,
                )
            )

        result = {
            "strings": [y_strings, z_strings, z_strings_prog, progressive_strings],
            "shape": [
                tuple(z_symbols.shape[1:3]),
                tuple(z_prog_symbols.shape[1:3]),
            ],
            "coder": self.coder_name,
        }
        if return_debug:
            complete = [
                self._merge_fn(self.params, slice_index=i,
                               y_main=y_hat_slices[i], y_prog=y_hat_prog[i])
                for i in range(self.model.num_slices)
            ]
            result["y_hat"] = self._final_latent_fn(
                self.params, y_hat_complete=tuple(complete),
                y_hat_prog=tuple(y_hat_prog), q_is_zero=False,
            )
        return result

    def decompress(
        self, strings, shape, quality=0.0, return_debug: bool = False,
        coder=None,
    ):
        """Fused path: one dispatch per slice (both branches fused)."""
        self._check_updated()
        self._check_coder(coder)
        q = self._normalize_quality(quality)
        with_prog = q != 0

        if not with_prog:
            # base-only: reuse the WACNN fused decode (decoder selection via
            # _synthesize_q handles multiple_decoder models)
            out = super().decompress(strings, shape[0], return_debug=return_debug)
            return out

        y_strings, z_strings = strings[0], strings[1]
        z_strings_prog, progressive_strings = strings[2], strings[3]
        z_hat = self._decode_z(z_strings, shape[0])

        zp_h, zp_w = shape[-1]
        c = self.model.hyper_channels
        zp_idx = eb_build_indexes((1, zp_h, zp_w, c), c)[0]
        dec1 = self._dec_cls()
        zp_sym = np.stack(
            [
                dec1.decode_with_indexes(s, zp_idx, self.eb_prog_table)
                .reshape(zp_h, zp_w, c)
                for s in z_strings_prog
            ]
        ).astype(np.float32)
        z_hat_prog = jnp.asarray(zp_sym + self._medians_prog)

        b = z_hat.shape[0]
        yh, yw = shape[0][0] * 4, shape[0][1] * 4
        sc = self.model.slice_ch
        ns = self.model.num_slices
        max_s = self.model.max_support_slices

        decoders = []
        for s in y_strings:
            d = self._dec_cls()
            d.set_stream(s)
            decoders.append(d)

        (lm, ls, mu, idx, mp, sp, mu_p, idx_p, mask) = (
            self._decode_begin_scal_fn(self.params, z_hat, z_hat_prog, q=q)
        )
        idx.copy_to_host_async()
        idx_p.copy_to_host_async()

        def decode_base(idx_dev):
            idx_np = np.asarray(idx_dev)
            outs = self._host_pool_map(
                lambda j: decoders[j].decode_stream(idx_np[j], self.gc_table), b
            )
            return jnp.asarray(
                np.stack(outs).astype(np.int8).reshape(b, yh, yw, sc)
            )

        def decode_prog(i, idx_dev):
            idx_np = np.asarray(idx_dev)
            dec_p = self._dec_cls()
            outs = self._host_pool_map(
                lambda j: dec_p.decode_with_indexes(
                    progressive_strings[i][j], idx_np[j], self.gc_table
                ),
                b,
            )
            return jnp.asarray(
                np.stack(outs).astype(np.int8).reshape(b, yh, yw, sc)
            )

        slices: List[jax.Array] = []
        slices_prog: List[jax.Array] = []
        for i in range(ns - 1):
            syms = decode_base(idx)
            syms_p = decode_prog(i, idx_p)
            y_prev, yp_prev, mu, idx, mu_p, idx_p = self._decode_step_scal_fn(
                self.params, slice_index=i + 1,
                symbols_prev=syms, mu_prev=mu,
                symbols_prev_prog=syms_p, mu_prev_prog=mu_p,
                latent_means=lm, latent_scales=ls,
                means_prog=mp, scales_prog=sp,
                support=tuple(slices[:max_s]),
                support_prog=tuple(slices_prog[:max_s]),
                mask=mask,
            )
            idx.copy_to_host_async()
            idx_p.copy_to_host_async()
            slices.append(y_prev)
            slices_prog.append(yp_prev)

        syms = decode_base(idx)
        syms_p = decode_prog(ns - 1, idx_p)
        x_hat, y_hat = self._decode_end_scal_fn(
            self.params,
            symbols=syms, mu=mu, symbols_prog=syms_p, mu_prog=mu_p,
            latent_means=lm, means_prog=mp,
            slices=tuple(slices), slices_prog=tuple(slices_prog),
            q=q,
        )
        out = {"x_hat": x_hat}
        if return_debug:
            out["y_hat"] = y_hat
        return out

    def selftest(
        self, x: jax.Array, quality=1, require_stream_equality: bool = True
    ) -> None:
        """Roundtrip integrity (+ optional fused-vs-stepped stream
        equality — see WACNNCodec.selftest for the two-layer contract)."""
        fused = self.compress(x, quality=quality, return_debug=True)

        def flat(group):
            if isinstance(group, (list, tuple)):
                return [s for g in group for s in flat(g)]
            return [group]

        if require_stream_equality:
            stepped = self.compress_stepped(
                x, quality=quality, return_debug=True
            )
            if flat(fused["strings"]) != flat(stepped["strings"]):
                raise AssertionError("fused/stepped scalable streams differ")
        rec = self.decompress(
            fused["strings"], fused["shape"], quality=quality, return_debug=True
        )
        if not np.array_equal(np.asarray(rec["y_hat"]), np.asarray(fused["y_hat"])):
            raise AssertionError("scalable decode did not reproduce encoder latents")

    def decompress_stepped(
        self, strings, shape, quality=0.0, return_debug: bool = False,
        coder=None,
    ):
        self._check_updated()
        self._check_coder(coder)
        q = self._normalize_quality(quality)
        with_prog = q != 0

        y_strings, z_strings = strings[0], strings[1]
        z_hat = self._decode_z(z_strings, shape[0])
        latent_means, latent_scales = self._hyper_fn(self.params, z_hat)

        b = z_hat.shape[0]
        yh, yw = shape[0][0] * 4, shape[0][1] * 4
        sc = self.model.slice_ch

        decoders = []
        for s in y_strings:
            d = self._dec_cls()
            d.set_stream(s)
            decoders.append(d)

        mask = None
        if with_prog:
            z_strings_prog, progressive_strings = strings[2], strings[3]
            zp_h, zp_w = shape[-1]
            c = self.model.hyper_channels
            zp_idx = eb_build_indexes((1, zp_h, zp_w, c), c)[0]
            dec1 = self._dec_cls()
            zp_sym = np.stack(
                [
                    dec1.decode_with_indexes(s, zp_idx, self.eb_prog_table)
                    .reshape(zp_h, zp_w, c)
                    for s in z_strings_prog
                ]
            ).astype(np.float32)
            z_hat_prog = jnp.asarray(zp_sym + self._medians_prog)
            means_prog, scales_prog = self._hyper_prog_fn(self.params, z_hat_prog)
            if self.model.uses_coding_mask:
                mask = self._mask_fn(
                    self.params, latent_scales=latent_scales,
                    scales_prog=scales_prog, q=q,
                )

        y_hat_slices: List[jax.Array] = []
        y_hat_prog: List[jax.Array] = []
        y_hat_complete: List[jax.Array] = []
        for i in range(self.model.num_slices):
            support = tuple(y_hat_slices[: self.model.max_support_slices])
            mu, _, indexes = self._slice_params_fn(
                self.params, slice_index=i,
                latent_means=latent_means, latent_scales=latent_scales,
                support=support,
            )
            idx_np = np.asarray(indexes)
            syms = np.stack(
                [
                    decoders[j].decode_stream(idx_np[j], self.gc_table)
                    for j in range(b)
                ]
            ).reshape(b, yh, yw, sc)
            y_hat_slice = self._slice_rec_fn(
                self.params, slice_index=i, symbols=jnp.asarray(syms), mu=mu,
                latent_means=latent_means, support=support,
            )
            y_hat_slices.append(y_hat_slice)

            if with_prog:
                support_p = tuple(y_hat_prog[: self.model.max_support_slices])
                block_mask = (
                    mask[..., i * sc : (i + 1) * sc]
                    if mask is not None else None
                )
                mu_p, _, idx_p = self._slice_params_prog_fn(
                    self.params, slice_index=i,
                    means_prog=means_prog, scales_prog=scales_prog,
                    support=support_p, block_mask=block_mask,
                )
                idxp_np = np.asarray(idx_p)
                dec_p = self._dec_cls()
                syms_p = np.stack(
                    [
                        dec_p.decode_with_indexes(
                            progressive_strings[i][j], idxp_np[j], self.gc_table
                        )
                        for j in range(b)
                    ]
                ).reshape(b, yh, yw, sc)
                y_hat_p = self._slice_rec_prog_fn(
                    self.params, slice_index=i, symbols=jnp.asarray(syms_p),
                    mu=mu_p, means_prog=means_prog, support=support_p,
                )
                y_hat_prog.append(y_hat_p)
                y_hat_complete.append(
                    self._merge_fn(self.params, slice_index=i,
                                   y_main=y_hat_slice, y_prog=y_hat_p)
                )
            else:
                y_hat_complete.append(y_hat_slice)

        y_hat = self._final_latent_fn(
            self.params, y_hat_complete=tuple(y_hat_complete),
            y_hat_prog=tuple(y_hat_prog), q_is_zero=not with_prog,
        )
        x_hat = self._synth_scal_fn(self.params, y_hat, q_is_zero=not with_prog)
        out = {"x_hat": x_hat}
        if return_debug:
            out["y_hat"] = y_hat
        return out
