// Native rANS entropy-coding runtime for resdsic_tpu.
//
// Implements a 64-bit-state range-variant ANS coder (rANS, after Duda; the
// renormalization scheme follows the public-domain "ryg_rans" rans64 design)
// with the CompressAI bitstream convention so that the Python layer has the
// same capability surface as the reference's `compressai.ans` pybind module
// (API pinned by call sites, see SURVEY.md §2.7; reference headers vendored at
// /root/reference/src/third_party/ryg_rans/rans64.h).
//
// Conventions (CompressAI-compatible):
//   * probability precision: 16 bits; CDF rows are strictly increasing
//     integer tables ending at 1<<16, produced by pmf_to_quantized_cdf below.
//   * per-symbol: value = symbol - offset[index]; values outside
//     [0, cdf_length-2) are coded via the final CDF bin (escape) followed by
//     bypass (raw-bit) coding of the folded remainder in 4-bit chunks with a
//     unary-style chunk-count prefix.
//   * the encoder buffers (start, range, bypass) triples and emits the stream
//     in reverse on flush (rANS is LIFO); flush appends the 64-bit final state
//     as two little-endian 32-bit words at the stream head.
//
// Exposed as a plain C ABI consumed from Python via ctypes with zero-copy
// numpy arrays (no List[int] round-trips like the reference Python layer).

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr int kPrecision = 16;                          // probability bits
constexpr uint64_t kRansL = 1ull << 31;                 // lower renorm bound
constexpr int kBypassPrecision = 4;                     // raw-bit chunk size
constexpr int32_t kMaxBypassVal = (1 << kBypassPrecision) - 1;

struct RansSymbol {
  uint32_t start;
  uint32_t range;  // 0 when bypass
  bool bypass;
};

// ---------------------------------------------------------------------------
// rANS primitives (64-bit state, 32-bit word renormalization)
// ---------------------------------------------------------------------------

inline void rans_enc_put(uint64_t &x, uint32_t *&ptr, uint32_t start,
                         uint32_t freq) {
  const uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
  if (x >= x_max) {
    *--ptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  x = ((x / freq) << kPrecision) + (x % freq) + start;
}

inline void rans_enc_put_bits(uint64_t &x, uint32_t *&ptr, uint32_t val,
                              uint32_t nbits) {
  const uint32_t freq = 1u << (kPrecision - nbits);
  const uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
  if (x >= x_max) {
    *--ptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  x = (x << nbits) | val;
}

inline void rans_enc_flush(uint64_t x, uint32_t *&ptr) {
  ptr -= 2;
  ptr[0] = static_cast<uint32_t>(x >> 0);
  ptr[1] = static_cast<uint32_t>(x >> 32);
}

inline void rans_dec_init(uint64_t &x, const uint32_t *&ptr) {
  x = static_cast<uint64_t>(ptr[0]) | (static_cast<uint64_t>(ptr[1]) << 32);
  ptr += 2;
}

inline uint32_t rans_dec_get(uint64_t x) {
  return static_cast<uint32_t>(x & ((1u << kPrecision) - 1));
}

inline void rans_dec_advance(uint64_t &x, const uint32_t *&ptr,
                             const uint32_t *end, uint32_t start,
                             uint32_t freq) {
  const uint64_t mask = (1u << kPrecision) - 1;
  x = freq * (x >> kPrecision) + (x & mask) - start;
  if (x < kRansL && ptr < end) {
    x = (x << 32) | *ptr;
    ++ptr;
  }
}

inline uint32_t rans_dec_get_bits(uint64_t &x, const uint32_t *&ptr,
                                  const uint32_t *end, uint32_t nbits) {
  const uint32_t val = static_cast<uint32_t>(x & ((1u << nbits) - 1));
  x >>= nbits;
  if (x < kRansL && ptr < end) {
    x = (x << 32) | *ptr;
    ++ptr;
  }
  return val;
}

// ---------------------------------------------------------------------------
// Buffered encoder
// ---------------------------------------------------------------------------

struct BufferedEncoder {
  std::vector<RansSymbol> syms;

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

    syms.push_back({static_cast<uint32_t>(cdf[value]),
                    static_cast<uint32_t>(cdf[value + 1] - cdf[value]), false});

    if (value == max_value) {
      // Bypass-code raw_val: chunk count (unary in base max_bypass_val),
      // then the chunks, least-significant first.
      int32_t n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;

      int32_t val = n_bypass;
      while (val >= kMaxBypassVal) {
        syms.push_back({static_cast<uint32_t>(kMaxBypassVal), 0, true});
        val -= kMaxBypassVal;
      }
      syms.push_back({static_cast<uint32_t>(val), 0, true});

      for (int32_t j = 0; j < n_bypass; ++j) {
        const uint32_t chunk =
            (raw_val >> (j * kBypassPrecision)) & kMaxBypassVal;
        syms.push_back({chunk, 0, true});
      }
    }
  }

  // Encode buffered symbols in reverse; returns malloc'd byte buffer.
  uint8_t *flush(int64_t *out_size) {
    const size_t n_words = syms.size() + 2;
    std::vector<uint32_t> output(n_words);
    uint32_t *ptr = output.data() + n_words;

    uint64_t x = kRansL;
    for (auto it = syms.rbegin(); it != syms.rend(); ++it) {
      if (it->bypass) {
        rans_enc_put_bits(x, ptr, it->start, kBypassPrecision);
      } else {
        rans_enc_put(x, ptr, it->start, it->range);
      }
    }
    rans_enc_flush(x, ptr);

    const size_t used_words =
        static_cast<size_t>(output.data() + n_words - ptr);
    const int64_t nbytes = static_cast<int64_t>(used_words * sizeof(uint32_t));
    uint8_t *buf = static_cast<uint8_t *>(std::malloc(nbytes));
    std::memcpy(buf, ptr, nbytes);
    *out_size = nbytes;
    syms.clear();
    return buf;
  }
};

// ---------------------------------------------------------------------------
// Decoder
// ---------------------------------------------------------------------------

struct Decoder {
  std::vector<uint32_t> words;  // padded copy of the stream
  const uint32_t *ptr = nullptr;
  const uint32_t *end = nullptr;
  uint64_t state = 0;

  void set_stream(const uint8_t *data, int64_t nbytes) {
    const size_t n_words = (static_cast<size_t>(nbytes) + 3) / 4;
    words.assign(n_words, 0);
    std::memcpy(words.data(), data, static_cast<size_t>(nbytes));
    ptr = words.data();
    end = words.data() + n_words;
    rans_dec_init(state, ptr);
  }

  void decode(const int32_t *indexes, int64_t n, const int32_t *cdfs,
              const int32_t *cdf_lengths, const int32_t *offsets,
              int32_t max_cdf_len, int32_t *out) {
    for (int64_t i = 0; i < n; ++i) {
      const int32_t index = indexes[i];
      const int32_t *cdf = cdfs + static_cast<int64_t>(index) * max_cdf_len;
      const int32_t length = cdf_lengths[index];
      const int32_t max_value = length - 2;

      const uint32_t cum = rans_dec_get(state);
      // CDF rows are strictly increasing: binary-search the bin.
      const int32_t *pos = std::upper_bound(
          cdf, cdf + length, static_cast<int32_t>(cum));
      int32_t value = static_cast<int32_t>(pos - cdf) - 1;

      rans_dec_advance(state, ptr, end, static_cast<uint32_t>(cdf[value]),
                       static_cast<uint32_t>(cdf[value + 1] - cdf[value]));

      if (value == max_value) {
        // Bypass-decode the folded remainder.
        uint32_t val = rans_dec_get_bits(state, ptr, end, kBypassPrecision);
        int32_t n_bypass = static_cast<int32_t>(val);
        while (val == static_cast<uint32_t>(kMaxBypassVal)) {
          val = rans_dec_get_bits(state, ptr, end, kBypassPrecision);
          n_bypass += static_cast<int32_t>(val);
        }
        uint32_t raw_val = 0;
        for (int32_t j = 0; j < n_bypass; ++j) {
          val = rans_dec_get_bits(state, ptr, end, kBypassPrecision);
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
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

void *rans_buffered_encoder_new() { return new BufferedEncoder(); }

void rans_buffered_encoder_free(void *handle) {
  delete static_cast<BufferedEncoder *>(handle);
}

int rans_buffered_encoder_put(void *handle, const int32_t *symbols,
                              const int32_t *indexes, int64_t n,
                              const int32_t *cdfs, const int32_t *cdf_lengths,
                              const int32_t *offsets, int32_t ncdfs,
                              int32_t max_cdf_len) {
  auto *enc = static_cast<BufferedEncoder *>(handle);
  for (int64_t i = 0; i < n; ++i) {
    if (indexes[i] < 0 || indexes[i] >= ncdfs) return -1;
    enc->put(symbols[i], indexes[i], cdfs, cdf_lengths, offsets, max_cdf_len);
  }
  return 0;
}

// Returns malloc'd buffer (caller frees via rans_free_buffer).
uint8_t *rans_buffered_encoder_flush(void *handle, int64_t *out_size) {
  return static_cast<BufferedEncoder *>(handle)->flush(out_size);
}

uint8_t *rans_encode_with_indexes(const int32_t *symbols,
                                  const int32_t *indexes, int64_t n,
                                  const int32_t *cdfs,
                                  const int32_t *cdf_lengths,
                                  const int32_t *offsets, int32_t ncdfs,
                                  int32_t max_cdf_len, int64_t *out_size) {
  BufferedEncoder enc;
  enc.syms.reserve(static_cast<size_t>(n) + 16);
  for (int64_t i = 0; i < n; ++i) {
    if (indexes[i] < 0 || indexes[i] >= ncdfs) {
      *out_size = -1;
      return nullptr;
    }
    enc.put(symbols[i], indexes[i], cdfs, cdf_lengths, offsets, max_cdf_len);
  }
  return enc.flush(out_size);
}

void rans_free_buffer(uint8_t *buf) { std::free(buf); }

void *rans_decoder_new() { return new Decoder(); }

void rans_decoder_free(void *handle) { delete static_cast<Decoder *>(handle); }

int rans_decoder_set_stream(void *handle, const uint8_t *data,
                            int64_t nbytes) {
  if (nbytes < 8) return -1;
  static_cast<Decoder *>(handle)->set_stream(data, nbytes);
  return 0;
}

int rans_decoder_decode_stream(void *handle, const int32_t *indexes,
                               int64_t n, const int32_t *cdfs,
                               const int32_t *cdf_lengths,
                               const int32_t *offsets, int32_t ncdfs,
                               int32_t max_cdf_len, int32_t *out) {
  auto *dec = static_cast<Decoder *>(handle);
  if (dec->ptr == nullptr) return -2;
  for (int64_t i = 0; i < n; ++i) {
    if (indexes[i] < 0 || indexes[i] >= ncdfs) return -1;
  }
  dec->decode(indexes, n, cdfs, cdf_lengths, offsets, max_cdf_len, out);
  return 0;
}

int rans_decode_with_indexes(const uint8_t *data, int64_t nbytes,
                             const int32_t *indexes, int64_t n,
                             const int32_t *cdfs, const int32_t *cdf_lengths,
                             const int32_t *offsets, int32_t ncdfs,
                             int32_t max_cdf_len, int32_t *out) {
  if (nbytes < 8) return -1;
  for (int64_t i = 0; i < n; ++i) {
    if (indexes[i] < 0 || indexes[i] >= ncdfs) return -1;
  }
  Decoder dec;
  dec.set_stream(data, nbytes);
  dec.decode(indexes, n, cdfs, cdf_lengths, offsets, max_cdf_len, out);
  return 0;
}

// ---------------------------------------------------------------------------
// Exact integer CDF quantization (capability of compressai._CXX
// pmf_to_quantized_cdf; algorithm family originates in tensorflow/compression
// — scale, floor-normalize, then de-zero empty bins by stealing mass from the
// smallest bin with freq > 1).
// ---------------------------------------------------------------------------

int pmf_to_quantized_cdf(const float *pmf, int32_t n, int32_t precision,
                         int32_t *out_cdf /* length n+1 */) {
  if (n <= 0 || precision <= 0 || precision > 24) return -1;

  std::vector<uint32_t> cdf(static_cast<size_t>(n) + 1);
  cdf[0] = 0;
  for (int32_t i = 0; i < n; ++i) {
    const float p = pmf[i];
    if (!(p >= 0.f) || p != p) return -2;  // negative or NaN
    // round in float32, matching CompressAI's `std::round(p * (1<<precision))`
    // (float arithmetic) so quantized tables agree bit-for-bit
    cdf[i + 1] = static_cast<uint32_t>(
        std::round(p * static_cast<float>(1u << precision)));
  }

  uint64_t total = 0;
  for (auto v : cdf) total += v;
  if (total == 0) return -3;

  for (auto &v : cdf) {
    v = static_cast<uint32_t>(
        (static_cast<uint64_t>(1u << precision) * v) / total);
  }
  std::partial_sum(cdf.begin(), cdf.end(), cdf.begin());
  cdf.back() = 1u << precision;

  for (int32_t i = 0; i < n; ++i) {
    if (cdf[i] == cdf[i + 1]) {
      // De-zero bin i by stealing from the smallest bin with freq > 1.
      uint32_t best_freq = ~0u;
      int32_t best_steal = -1;
      for (int32_t j = 0; j < n; ++j) {
        const uint32_t freq = cdf[j + 1] - cdf[j];
        if (freq > 1 && freq < best_freq) {
          best_freq = freq;
          best_steal = j;
        }
      }
      if (best_steal == -1) return -4;
      if (best_steal < i) {
        for (int32_t j = best_steal + 1; j <= i; ++j) cdf[j]--;
      } else {
        for (int32_t j = i + 1; j <= best_steal; ++j) cdf[j]++;
      }
    }
  }

  for (int32_t i = 0; i <= n; ++i) out_cdf[i] = static_cast<int32_t>(cdf[i]);
  return 0;
}

// Batched variant: pmfs is (rows, max_pmf_len) row-major with per-row valid
// length pmf_lengths[r]; tail_mass[r] is appended as the final bin. Output is
// (rows, max_pmf_len + 2) int32, zero-padded — matching the layout of the
// reference `_pmf_to_cdf` (entropy_models.py:174-182).
int pmf_to_quantized_cdf_batch(const float *pmfs, const float *tail_mass,
                               const int32_t *pmf_lengths, int32_t rows,
                               int32_t max_pmf_len, int32_t precision,
                               int32_t *out /* rows x (max_pmf_len+2) */) {
  const int32_t out_stride = max_pmf_len + 2;
  std::vector<float> prob(static_cast<size_t>(max_pmf_len) + 1);
  for (int32_t r = 0; r < rows; ++r) {
    const int32_t len = pmf_lengths[r];
    if (len <= 0 || len > max_pmf_len) return -1;
    std::memcpy(prob.data(), pmfs + static_cast<int64_t>(r) * max_pmf_len,
                sizeof(float) * static_cast<size_t>(len));
    prob[len] = tail_mass[r];
    std::memset(out + static_cast<int64_t>(r) * out_stride, 0,
                sizeof(int32_t) * static_cast<size_t>(out_stride));
    const int rc = pmf_to_quantized_cdf(
        prob.data(), len + 1, precision,
        out + static_cast<int64_t>(r) * out_stride);
    if (rc != 0) return rc;
  }
  return 0;
}

}  // extern "C"
