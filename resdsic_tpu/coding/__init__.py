"""Python bindings for the native rANS entropy-coding runtime.

Capability parity with the reference's `compressai.ans` /
`compressai._CXX.pmf_to_quantized_cdf` (SURVEY.md §2.7), but with a
vectorized numpy-array API: symbols/indexes/CDF tables cross the
Python↔C++ boundary as zero-copy int32 buffers instead of List[int].

Classes:
    BufferedRansEncoder — accumulate (symbols, indexes) batches, flush() → bytes
    RansEncoder         — one-shot encode_with_indexes → bytes
    RansDecoder         — set_stream / decode_stream (stateful) and
                          decode_with_indexes (one-shot)

CDF tables are passed as a CdfTable (cdf matrix, per-row lengths, offsets).
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from .build import build_library

_lib = ctypes.CDLL(str(build_library()))

_c_i32p = ctypes.POINTER(ctypes.c_int32)
_c_u8p = ctypes.POINTER(ctypes.c_uint8)
_c_f32p = ctypes.POINTER(ctypes.c_float)

_lib.rans_buffered_encoder_new.restype = ctypes.c_void_p
_lib.rans_buffered_encoder_free.argtypes = [ctypes.c_void_p]
_lib.rans_buffered_encoder_put.restype = ctypes.c_int
_lib.rans_buffered_encoder_put.argtypes = [
    ctypes.c_void_p, _c_i32p, _c_i32p, ctypes.c_int64,
    _c_i32p, _c_i32p, _c_i32p, ctypes.c_int32, ctypes.c_int32,
]
_lib.rans_buffered_encoder_flush.restype = _c_u8p
_lib.rans_buffered_encoder_flush.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
]
_lib.rans_encode_with_indexes.restype = _c_u8p
_lib.rans_encode_with_indexes.argtypes = [
    _c_i32p, _c_i32p, ctypes.c_int64,
    _c_i32p, _c_i32p, _c_i32p, ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int64),
]
_lib.rans_free_buffer.argtypes = [_c_u8p]
_lib.rans_decoder_new.restype = ctypes.c_void_p
_lib.rans_decoder_free.argtypes = [ctypes.c_void_p]
_lib.rans_decoder_set_stream.restype = ctypes.c_int
_lib.rans_decoder_set_stream.argtypes = [
    ctypes.c_void_p, _c_u8p, ctypes.c_int64,
]
_lib.rans_decoder_decode_stream.restype = ctypes.c_int
_lib.rans_decoder_decode_stream.argtypes = [
    ctypes.c_void_p, _c_i32p, ctypes.c_int64,
    _c_i32p, _c_i32p, _c_i32p, ctypes.c_int32, ctypes.c_int32, _c_i32p,
]
_lib.rans_decode_with_indexes.restype = ctypes.c_int
_lib.rans_decode_with_indexes.argtypes = [
    _c_u8p, ctypes.c_int64, _c_i32p, ctypes.c_int64,
    _c_i32p, _c_i32p, _c_i32p, ctypes.c_int32, ctypes.c_int32, _c_i32p,
]
_lib.pmf_to_quantized_cdf.restype = ctypes.c_int
_lib.pmf_to_quantized_cdf.argtypes = [
    _c_f32p, ctypes.c_int32, ctypes.c_int32, _c_i32p,
]
_lib.pmf_to_quantized_cdf_batch.restype = ctypes.c_int
_lib.pmf_to_quantized_cdf_batch.argtypes = [
    _c_f32p, _c_f32p, _c_i32p, ctypes.c_int32, ctypes.c_int32,
    ctypes.c_int32, _c_i32p,
]

# range coder (rc_*): FIFO counterpart sharing the CdfTable conventions
_lib.rc_encoder_new.restype = ctypes.c_void_p
_lib.rc_encoder_free.argtypes = [ctypes.c_void_p]
_lib.rc_encoder_put.restype = ctypes.c_int
_lib.rc_encoder_put.argtypes = [
    ctypes.c_void_p, _c_i32p, _c_i32p, ctypes.c_int64,
    _c_i32p, _c_i32p, _c_i32p, ctypes.c_int32, ctypes.c_int32,
]
_lib.rc_encoder_flush.restype = _c_u8p
_lib.rc_encoder_flush.argtypes = [
    ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
]
_lib.rc_encode_with_indexes.restype = _c_u8p
_lib.rc_encode_with_indexes.argtypes = [
    _c_i32p, _c_i32p, ctypes.c_int64,
    _c_i32p, _c_i32p, _c_i32p, ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int64),
]
_lib.rc_decoder_new.restype = ctypes.c_void_p
_lib.rc_decoder_free.argtypes = [ctypes.c_void_p]
_lib.rc_decoder_set_stream.restype = ctypes.c_int
_lib.rc_decoder_set_stream.argtypes = [
    ctypes.c_void_p, _c_u8p, ctypes.c_int64,
]
_lib.rc_decoder_decode_stream.restype = ctypes.c_int
_lib.rc_decoder_decode_stream.argtypes = [
    ctypes.c_void_p, _c_i32p, ctypes.c_int64,
    _c_i32p, _c_i32p, _c_i32p, ctypes.c_int32, ctypes.c_int32, _c_i32p,
]
_lib.rc_decode_with_indexes.restype = ctypes.c_int
_lib.rc_decode_with_indexes.argtypes = [
    _c_u8p, ctypes.c_int64, _c_i32p, ctypes.c_int64,
    _c_i32p, _c_i32p, _c_i32p, ctypes.c_int32, ctypes.c_int32, _c_i32p,
]


def _as_i32(a) -> np.ndarray:
    arr = np.ascontiguousarray(a, dtype=np.int32)
    return arr


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(_c_i32p)


@dataclass(frozen=True)
class CdfTable:
    """Integer CDF tables for a set of distributions.

    cdf:        (ncdfs, max_len) int32, each row a strictly increasing CDF
                ending at 1<<16 within its valid length, zero-padded after.
    cdf_length: (ncdfs,) int32 — valid entries per row (pmf_length + 2).
    offset:     (ncdfs,) int32 — symbol offset per row.
    """

    cdf: np.ndarray
    cdf_length: np.ndarray
    offset: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "cdf", _as_i32(self.cdf))
        object.__setattr__(self, "cdf_length", _as_i32(self.cdf_length).ravel())
        object.__setattr__(self, "offset", _as_i32(self.offset).ravel())
        if self.cdf.ndim != 2:
            raise ValueError("cdf must be 2D (ncdfs, max_len)")
        if len(self.cdf_length) != self.cdf.shape[0]:
            raise ValueError("cdf_length size mismatch")
        if len(self.offset) != self.cdf.shape[0]:
            raise ValueError("offset size mismatch")

    @property
    def ncdfs(self) -> int:
        return self.cdf.shape[0]

    @property
    def max_len(self) -> int:
        return self.cdf.shape[1]


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    """Quantize a single pmf (1D float array) to an exact integer CDF."""
    p = np.ascontiguousarray(pmf, dtype=np.float32).ravel()
    out = np.empty(len(p) + 1, dtype=np.int32)
    rc = _lib.pmf_to_quantized_cdf(
        p.ctypes.data_as(_c_f32p), len(p), precision, _i32p(out)
    )
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed (code {rc})")
    return out


def pmf_to_quantized_cdf_batch(
    pmfs, tail_mass, pmf_lengths, precision: int = 16
) -> CdfTable:
    """Build a CdfTable from ragged pmfs.

    pmfs:        (rows, max_pmf_len) float; row r valid up to pmf_lengths[r].
    tail_mass:   (rows,) float appended as the escape bin of each row.
    pmf_lengths: (rows,) int.
    Matches the reference `_pmf_to_cdf` layout (entropy_models.py:174-182);
    offsets are set by the caller.
    """
    p = np.ascontiguousarray(pmfs, dtype=np.float32)
    t = np.ascontiguousarray(tail_mass, dtype=np.float32).ravel()
    lens = _as_i32(pmf_lengths).ravel()
    rows, max_pmf_len = p.shape
    out = np.zeros((rows, max_pmf_len + 2), dtype=np.int32)
    rc = _lib.pmf_to_quantized_cdf_batch(
        p.ctypes.data_as(_c_f32p),
        t.ctypes.data_as(_c_f32p),
        _i32p(lens),
        rows,
        max_pmf_len,
        precision,
        _i32p(out),
    )
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf_batch failed (code {rc})")
    return CdfTable(cdf=out, cdf_length=lens + 2, offset=np.zeros(rows, np.int32))


class BufferedRansEncoder:
    """Accumulates symbol batches; flush() emits one rANS stream (LIFO)."""

    def __init__(self):
        self._handle = _lib.rans_buffered_encoder_new()
        self._free = _lib.rans_buffered_encoder_free  # survives interp teardown

    def __del__(self):
        if getattr(self, "_handle", None):
            self._free(self._handle)
            self._handle = None

    def encode_with_indexes(self, symbols, indexes, table: CdfTable) -> None:
        sym = _as_i32(symbols).ravel()
        idx = _as_i32(indexes).ravel()
        if sym.shape != idx.shape:
            raise ValueError("symbols/indexes shape mismatch")
        rc = _lib.rans_buffered_encoder_put(
            self._handle, _i32p(sym), _i32p(idx), len(sym),
            _i32p(table.cdf), _i32p(table.cdf_length), _i32p(table.offset),
            table.ncdfs, table.max_len,
        )
        if rc != 0:
            raise ValueError(f"encode_with_indexes failed (code {rc})")

    def flush(self) -> bytes:
        size = ctypes.c_int64()
        buf = _lib.rans_buffered_encoder_flush(self._handle, ctypes.byref(size))
        try:
            return ctypes.string_at(buf, size.value)
        finally:
            _lib.rans_free_buffer(buf)


class RansEncoder:
    """One-shot encoder: encode_with_indexes returns the byte stream."""

    def encode_with_indexes(self, symbols, indexes, table: CdfTable) -> bytes:
        sym = _as_i32(symbols).ravel()
        idx = _as_i32(indexes).ravel()
        if sym.shape != idx.shape:
            raise ValueError("symbols/indexes shape mismatch")
        size = ctypes.c_int64()
        buf = _lib.rans_encode_with_indexes(
            _i32p(sym), _i32p(idx), len(sym),
            _i32p(table.cdf), _i32p(table.cdf_length), _i32p(table.offset),
            table.ncdfs, table.max_len, ctypes.byref(size),
        )
        if not buf:
            raise ValueError(f"encode_with_indexes failed (code {size.value})")
        try:
            return ctypes.string_at(buf, size.value)
        finally:
            _lib.rans_free_buffer(buf)


class RansDecoder:
    """Stateful decoder: set_stream once, then decode_stream per slice."""

    def __init__(self):
        self._handle = _lib.rans_decoder_new()
        self._free = _lib.rans_decoder_free  # survives interpreter teardown

    def __del__(self):
        if getattr(self, "_handle", None):
            self._free(self._handle)
            self._handle = None

    def set_stream(self, data: bytes) -> None:
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        rc = _lib.rans_decoder_set_stream(
            self._handle, ctypes.cast(buf, _c_u8p), len(data)
        )
        if rc != 0:
            raise ValueError(f"set_stream failed (code {rc})")

    def decode_stream(self, indexes, table: CdfTable) -> np.ndarray:
        idx = _as_i32(indexes).ravel()
        out = np.empty(len(idx), dtype=np.int32)
        rc = _lib.rans_decoder_decode_stream(
            self._handle, _i32p(idx), len(idx),
            _i32p(table.cdf), _i32p(table.cdf_length), _i32p(table.offset),
            table.ncdfs, table.max_len, _i32p(out),
        )
        if rc != 0:
            raise ValueError(f"decode_stream failed (code {rc})")
        return out

    def decode_with_indexes(self, data: bytes, indexes, table: CdfTable) -> np.ndarray:
        idx = _as_i32(indexes).ravel()
        out = np.empty(len(idx), dtype=np.int32)
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        rc = _lib.rans_decode_with_indexes(
            ctypes.cast(buf, _c_u8p), len(data), _i32p(idx), len(idx),
            _i32p(table.cdf), _i32p(table.cdf_length), _i32p(table.offset),
            table.ncdfs, table.max_len, _i32p(out),
        )
        if rc != 0:
            raise ValueError(f"decode_with_indexes failed (code {rc})")
        return out


class BufferedRangeEncoder:
    """Range-coder buffered encoder. FIFO, so puts encode eagerly; flush()
    finalizes the stream and resets the state for reuse."""

    def __init__(self):
        self._handle = _lib.rc_encoder_new()
        self._free = _lib.rc_encoder_free  # survives interpreter teardown

    def __del__(self):
        if getattr(self, "_handle", None):
            self._free(self._handle)
            self._handle = None

    def encode_with_indexes(self, symbols, indexes, table: CdfTable) -> None:
        sym = _as_i32(symbols).ravel()
        idx = _as_i32(indexes).ravel()
        if sym.shape != idx.shape:
            raise ValueError("symbols/indexes shape mismatch")
        rc = _lib.rc_encoder_put(
            self._handle, _i32p(sym), _i32p(idx), len(sym),
            _i32p(table.cdf), _i32p(table.cdf_length), _i32p(table.offset),
            table.ncdfs, table.max_len,
        )
        if rc != 0:
            raise ValueError(f"encode_with_indexes failed (code {rc})")

    def flush(self) -> bytes:
        size = ctypes.c_int64()
        buf = _lib.rc_encoder_flush(self._handle, ctypes.byref(size))
        try:
            return ctypes.string_at(buf, size.value)
        finally:
            _lib.rans_free_buffer(buf)


class RangeEncoder:
    """One-shot range-coder encoder (same API as RansEncoder)."""

    def encode_with_indexes(self, symbols, indexes, table: CdfTable) -> bytes:
        sym = _as_i32(symbols).ravel()
        idx = _as_i32(indexes).ravel()
        if sym.shape != idx.shape:
            raise ValueError("symbols/indexes shape mismatch")
        size = ctypes.c_int64()
        buf = _lib.rc_encode_with_indexes(
            _i32p(sym), _i32p(idx), len(sym),
            _i32p(table.cdf), _i32p(table.cdf_length), _i32p(table.offset),
            table.ncdfs, table.max_len, ctypes.byref(size),
        )
        if not buf:
            raise ValueError(f"encode_with_indexes failed (code {size.value})")
        try:
            return ctypes.string_at(buf, size.value)
        finally:
            _lib.rans_free_buffer(buf)


class RangeDecoder:
    """Stateful range-coder decoder (same API as RansDecoder)."""

    def __init__(self):
        self._handle = _lib.rc_decoder_new()
        self._free = _lib.rc_decoder_free  # survives interpreter teardown

    def __del__(self):
        if getattr(self, "_handle", None):
            self._free(self._handle)
            self._handle = None

    def set_stream(self, data: bytes) -> None:
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        rc = _lib.rc_decoder_set_stream(
            self._handle, ctypes.cast(buf, _c_u8p), len(data)
        )
        if rc != 0:
            raise ValueError(f"set_stream failed (code {rc})")

    def decode_stream(self, indexes, table: CdfTable) -> np.ndarray:
        idx = _as_i32(indexes).ravel()
        out = np.empty(len(idx), dtype=np.int32)
        rc = _lib.rc_decoder_decode_stream(
            self._handle, _i32p(idx), len(idx),
            _i32p(table.cdf), _i32p(table.cdf_length), _i32p(table.offset),
            table.ncdfs, table.max_len, _i32p(out),
        )
        if rc != 0:
            raise ValueError(f"decode_stream failed (code {rc})")
        return out

    def decode_with_indexes(self, data: bytes, indexes, table: CdfTable) -> np.ndarray:
        idx = _as_i32(indexes).ravel()
        out = np.empty(len(idx), dtype=np.int32)
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        rc = _lib.rc_decode_with_indexes(
            ctypes.cast(buf, _c_u8p), len(data), _i32p(idx), len(idx),
            _i32p(table.cdf), _i32p(table.cdf_length), _i32p(table.offset),
            table.ncdfs, table.max_len, _i32p(out),
        )
        if rc != 0:
            raise ValueError(f"decode_with_indexes failed (code {rc})")
        return out


_CODER_CLASSES = {
    "ans": (RansEncoder, RansDecoder, BufferedRansEncoder),
    "rangecoder": (RangeEncoder, RangeDecoder, BufferedRangeEncoder),
}


def coder_classes(name: str | None = None):
    """(encoder_cls, decoder_cls, buffered_encoder_cls) for a coder name.

    With name=None, uses the session default from the top-level registry
    (resdsic_tpu.set_entropy_coder) — the TPU-native analogue of the
    reference's _EntropyCoder proxy (entropy_models.py:17-51)."""
    if name is None:
        from .. import get_entropy_coder

        name = get_entropy_coder()
    try:
        return _CODER_CLASSES[name]
    except KeyError:
        raise ValueError(
            f'Unknown entropy coder "{name}" '
            f"(available: {', '.join(_CODER_CLASSES)})"
        ) from None


__all__ = [
    "CdfTable",
    "BufferedRansEncoder",
    "RansEncoder",
    "RansDecoder",
    "BufferedRangeEncoder",
    "RangeEncoder",
    "RangeDecoder",
    "coder_classes",
    "pmf_to_quantized_cdf",
    "pmf_to_quantized_cdf_batch",
]
