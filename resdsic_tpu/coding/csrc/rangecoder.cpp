// Native range-coder runtime for resdsic_tpu — the registry's second
// entropy coder ("rangecoder", capability parity with the reference's
// optional `range_coder` backend, src/compress/__init__.py:22-62 and
// entropy_models.py:37-41).
//
// A carry-less 32-bit range coder (Subbotin renormalization: byte-at-a-time,
// the range is clipped instead of propagating carries). Unlike the rANS
// coder it is FIFO: symbols are encoded eagerly in stream order, so the
// buffered encoder needs no symbol queue and flush() just finalizes.
//
// Table + escape conventions are shared with rans.cpp so both coders consume
// the same CdfTable objects:
//   * 16-bit probability precision, strictly increasing CDF rows ending at
//     1<<16;
//   * per-symbol: value = symbol - offset[index]; out-of-range values are
//     coded via the final CDF bin (escape) followed by raw-bit bypass coding
//     of the folded remainder in 4-bit chunks with a base-15 unary chunk
//     count prefix.
//
// Exposed as a plain C ABI (rc_* symbols) consumed via ctypes; buffers are
// freed with the shared rans_free_buffer (plain free()).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecision = 16;  // probability bits (CDF total = 1<<16)
constexpr uint32_t kTop = 1u << 24;
constexpr uint32_t kBot = 1u << 16;
constexpr int kBypassPrecision = 4;  // raw-bit chunk size
constexpr int32_t kMaxBypassVal = (1 << kBypassPrecision) - 1;

// ---------------------------------------------------------------------------
// Range-coder primitives
// ---------------------------------------------------------------------------

struct RangeEncoderState {
  uint32_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  std::vector<uint8_t> out;
  bool finalized = false;

  void renorm() {
    while ((low ^ (low + range)) < kTop ||
           (range < kBot && ((range = (0u - low) & (kBot - 1)), true))) {
      out.push_back(static_cast<uint8_t>(low >> 24));
      low <<= 8;
      range <<= 8;
    }
  }

  // Encode a symbol occupying [cum, cum+freq) of the 1<<16 total.
  void encode(uint32_t cum, uint32_t freq) {
    range >>= kPrecision;
    low += cum * range;
    range *= freq;
    renorm();
  }

  // Encode nbits raw bits (uniform model, freq = 1 of 1<<nbits).
  void encode_bits(uint32_t val, uint32_t nbits) {
    range >>= nbits;
    low += val * range;
    renorm();
  }

  void finalize() {
    if (finalized) return;
    for (int i = 0; i < 4; ++i) {
      out.push_back(static_cast<uint8_t>(low >> 24));
      low <<= 8;
    }
    finalized = true;
  }

  void put(int32_t symbol, int32_t index, const int32_t *cdfs,
           const int32_t *cdf_lengths, const int32_t *offsets,
           int32_t max_cdf_len) {
    const int32_t *cdf = cdfs + static_cast<int64_t>(index) * max_cdf_len;
    const int32_t max_value = cdf_lengths[index] - 2;
    int32_t value = symbol - offsets[index];

    uint32_t raw_val = 0;
    if (value < 0) {
      raw_val = static_cast<uint32_t>(-2 * value - 1);
      value = max_value;
    } else if (value >= max_value) {
      raw_val = static_cast<uint32_t>(2 * (value - max_value));
      value = max_value;
    }

    encode(static_cast<uint32_t>(cdf[value]),
           static_cast<uint32_t>(cdf[value + 1] - cdf[value]));

    if (value == max_value) {
      int32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;

      int32_t val = n_bypass;
      while (val >= kMaxBypassVal) {
        encode_bits(static_cast<uint32_t>(kMaxBypassVal), kBypassPrecision);
        val -= kMaxBypassVal;
      }
      encode_bits(static_cast<uint32_t>(val), kBypassPrecision);

      for (int32_t j = 0; j < n_bypass; ++j) {
        encode_bits((raw_val >> (j * kBypassPrecision)) & kMaxBypassVal,
                    kBypassPrecision);
      }
    }
  }

  uint8_t *flush(int64_t *out_size) {
    finalize();
    uint8_t *buf = static_cast<uint8_t *>(std::malloc(out.size()));
    std::memcpy(buf, out.data(), out.size());
    *out_size = static_cast<int64_t>(out.size());
    // reset for reuse
    low = 0;
    range = 0xFFFFFFFFu;
    out.clear();
    finalized = false;
    return buf;
  }
};

struct RangeDecoderState {
  std::vector<uint8_t> data;
  size_t pos = 0;
  uint32_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint32_t code = 0;
  bool ready = false;

  uint8_t next_byte() { return pos < data.size() ? data[pos++] : 0; }

  void set_stream(const uint8_t *bytes, int64_t nbytes) {
    data.assign(bytes, bytes + nbytes);
    pos = 0;
    low = 0;
    range = 0xFFFFFFFFu;
    code = 0;
    for (int i = 0; i < 4; ++i) code = (code << 8) | next_byte();
    ready = true;
  }

  void renorm() {
    while ((low ^ (low + range)) < kTop ||
           (range < kBot && ((range = (0u - low) & (kBot - 1)), true))) {
      code = (code << 8) | next_byte();
      low <<= 8;
      range <<= 8;
    }
  }

  uint32_t decode_bits(uint32_t nbits) {
    range >>= nbits;
    uint32_t val = (code - low) / range;
    const uint32_t maxval = (1u << nbits) - 1;
    if (val > maxval) val = maxval;
    low += val * range;
    renorm();
    return val;
  }

  void decode(const int32_t *indexes, int64_t n, const int32_t *cdfs,
              const int32_t *cdf_lengths, const int32_t *offsets,
              int32_t max_cdf_len, int32_t *out) {
    for (int64_t i = 0; i < n; ++i) {
      const int32_t index = indexes[i];
      const int32_t *cdf = cdfs + static_cast<int64_t>(index) * max_cdf_len;
      const int32_t length = cdf_lengths[index];
      const int32_t max_value = length - 2;

      range >>= kPrecision;
      uint32_t cum = (code - low) / range;
      if (cum > ((1u << kPrecision) - 1)) cum = (1u << kPrecision) - 1;

      const int32_t *posp = std::upper_bound(cdf, cdf + length,
                                             static_cast<int32_t>(cum));
      int32_t value = static_cast<int32_t>(posp - cdf) - 1;

      low += static_cast<uint32_t>(cdf[value]) * range;
      range *= static_cast<uint32_t>(cdf[value + 1] - cdf[value]);
      renorm();

      if (value == max_value) {
        uint32_t val = decode_bits(kBypassPrecision);
        int32_t n_bypass = static_cast<int32_t>(val);
        while (val == static_cast<uint32_t>(kMaxBypassVal)) {
          val = decode_bits(kBypassPrecision);
          n_bypass += static_cast<int32_t>(val);
        }
        uint32_t raw_val = 0;
        for (int32_t j = 0; j < n_bypass; ++j) {
          val = decode_bits(kBypassPrecision);
          raw_val |= val << (j * kBypassPrecision);
        }
        value = static_cast<int32_t>(raw_val >> 1);
        if (raw_val & 1) {
          value = -value - 1;
        } else {
          value += max_value;
        }
      }

      out[i] = value + offsets[index];
    }
  }
};

}  // namespace

// ---------------------------------------------------------------------------
// C ABI (rc_* — same shapes as the rans_* surface)
// ---------------------------------------------------------------------------

extern "C" {

void *rc_encoder_new() { return new RangeEncoderState(); }

void rc_encoder_free(void *handle) {
  delete static_cast<RangeEncoderState *>(handle);
}

int rc_encoder_put(void *handle, const int32_t *symbols,
                   const int32_t *indexes, int64_t n, const int32_t *cdfs,
                   const int32_t *cdf_lengths, const int32_t *offsets,
                   int32_t ncdfs, int32_t max_cdf_len) {
  auto *enc = static_cast<RangeEncoderState *>(handle);
  for (int64_t i = 0; i < n; ++i) {
    if (indexes[i] < 0 || indexes[i] >= ncdfs) return -1;
    enc->put(symbols[i], indexes[i], cdfs, cdf_lengths, offsets, max_cdf_len);
  }
  return 0;
}

// Returns malloc'd buffer (caller frees via rans_free_buffer).
uint8_t *rc_encoder_flush(void *handle, int64_t *out_size) {
  return static_cast<RangeEncoderState *>(handle)->flush(out_size);
}

uint8_t *rc_encode_with_indexes(const int32_t *symbols, const int32_t *indexes,
                                int64_t n, const int32_t *cdfs,
                                const int32_t *cdf_lengths,
                                const int32_t *offsets, int32_t ncdfs,
                                int32_t max_cdf_len, int64_t *out_size) {
  RangeEncoderState enc;
  for (int64_t i = 0; i < n; ++i) {
    if (indexes[i] < 0 || indexes[i] >= ncdfs) {
      *out_size = -1;
      return nullptr;
    }
    enc.put(symbols[i], indexes[i], cdfs, cdf_lengths, offsets, max_cdf_len);
  }
  return enc.flush(out_size);
}

void *rc_decoder_new() { return new RangeDecoderState(); }

void rc_decoder_free(void *handle) {
  delete static_cast<RangeDecoderState *>(handle);
}

int rc_decoder_set_stream(void *handle, const uint8_t *data, int64_t nbytes) {
  if (nbytes < 4) return -1;
  static_cast<RangeDecoderState *>(handle)->set_stream(data, nbytes);
  return 0;
}

int rc_decoder_decode_stream(void *handle, const int32_t *indexes, int64_t n,
                             const int32_t *cdfs, const int32_t *cdf_lengths,
                             const int32_t *offsets, int32_t ncdfs,
                             int32_t max_cdf_len, int32_t *out) {
  auto *dec = static_cast<RangeDecoderState *>(handle);
  if (!dec->ready) return -2;
  for (int64_t i = 0; i < n; ++i) {
    if (indexes[i] < 0 || indexes[i] >= ncdfs) return -1;
  }
  dec->decode(indexes, n, cdfs, cdf_lengths, offsets, max_cdf_len, out);
  return 0;
}

int rc_decode_with_indexes(const uint8_t *data, int64_t nbytes,
                           const int32_t *indexes, int64_t n,
                           const int32_t *cdfs, const int32_t *cdf_lengths,
                           const int32_t *offsets, int32_t ncdfs,
                           int32_t max_cdf_len, int32_t *out) {
  if (nbytes < 4) return -1;
  for (int64_t i = 0; i < n; ++i) {
    if (indexes[i] < 0 || indexes[i] >= ncdfs) return -1;
  }
  RangeDecoderState dec;
  dec.set_stream(data, nbytes);
  dec.decode(indexes, n, cdfs, cdf_lengths, offsets, max_cdf_len, out);
  return 0;
}

}  // extern "C"
