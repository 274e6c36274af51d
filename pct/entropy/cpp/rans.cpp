// rANS entropy coder for the pct framework (C ABI, loaded via ctypes).
//
// Replaces the CompressAI `ans` extension used by the reference codec
// (reference `codec_pipeline.py:305-306,425-430`, `codec_parallel.py:307,398-403`).
// Same coding scheme family: 64-bit range-asymmetric-numeral-system state with
// 32-bit renormalization (ryg_rans "Rans64" construction, public domain
// algorithm), 16-bit quantized CDFs, and an escape+bypass path (4-bit chunks)
// for symbols outside the table range, so rate behavior matches the reference
// entropy coder.
//
// Streams are self-contained: u32 words serialized little-endian, the decoder
// reads them in forward order.
//
// Build: g++ -O2 -shared -fPIC -o librans.so rans.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint64_t kRansL = 1ull << 31;  // lower bound of the state interval
constexpr int kPrecision = 16;           // CDF quantization precision
constexpr int kBypassPrecision = 4;      // raw-bit chunk size for escapes
constexpr uint32_t kMaxBypassVal = (1u << kBypassPrecision) - 1;

struct Encoder {
  uint64_t x = kRansL;
  std::vector<uint32_t> words;  // emitted in encode order; reversed on flush

  inline void put(uint32_t start, uint32_t freq) {
    uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
    while (x >= x_max) {
      words.push_back((uint32_t)x);
      x >>= 32;
    }
    x = ((x / freq) << kPrecision) + (x % freq) + start;
  }

  inline void put_bits(uint32_t val, int nbits) {
    uint64_t x_max = (kRansL >> nbits) << 32;
    while (x >= x_max) {
      words.push_back((uint32_t)x);
      x >>= 32;
    }
    x = (x << nbits) | val;
  }

  // Serialize: flush state, reverse words, write little-endian bytes.
  int flush(uint8_t* out, int capacity) {
    words.push_back((uint32_t)x);
    words.push_back((uint32_t)(x >> 32));
    int nbytes = (int)(words.size() * 4);
    if (nbytes > capacity) return -1;
    for (size_t i = 0; i < words.size(); ++i) {
      uint32_t w = words[words.size() - 1 - i];
      out[4 * i + 0] = (uint8_t)(w);
      out[4 * i + 1] = (uint8_t)(w >> 8);
      out[4 * i + 2] = (uint8_t)(w >> 16);
      out[4 * i + 3] = (uint8_t)(w >> 24);
    }
    return nbytes;
  }
};

struct Decoder {
  uint64_t x = 0;
  const uint8_t* buf;
  int nbytes;
  int pos = 0;  // byte position

  inline uint32_t next_word() {
    if (pos + 4 > nbytes) return 0;  // ran off the stream: zeros (error state)
    uint32_t w = (uint32_t)buf[pos] | ((uint32_t)buf[pos + 1] << 8) |
                 ((uint32_t)buf[pos + 2] << 16) | ((uint32_t)buf[pos + 3] << 24);
    pos += 4;
    return w;
  }

  void init(const uint8_t* b, int n) {
    buf = b;
    nbytes = n;
    uint64_t hi = next_word();
    uint64_t lo = next_word();
    x = (hi << 32) | lo;
  }

  // Returns the cumulative-frequency slot; caller resolves the symbol.
  inline uint32_t get_cf() const { return (uint32_t)(x & ((1u << kPrecision) - 1)); }

  inline void advance(uint32_t start, uint32_t freq) {
    x = freq * (x >> kPrecision) + get_cf() - start;
    while (x < kRansL) x = (x << 32) | next_word();
  }

  inline uint32_t get_bits(int nbits) {
    uint32_t val = (uint32_t)(x & ((1u << nbits) - 1));
    x >>= nbits;
    while (x < kRansL) x = (x << 32) | next_word();
    return val;
  }
};

// Binary search: largest s with cdf[s] <= cf (cdf has `len` entries, cdf[0]=0,
// cdf[len-1] = 2^precision).
inline int find_symbol(const int32_t* cdf, int len, uint32_t cf) {
  int lo = 0, hi = len - 1;  // invariant: cdf[lo] <= cf < cdf[hi]
  while (hi - lo > 1) {
    int mid = (lo + hi) >> 1;
    if ((uint32_t)cdf[mid] <= cf)
      lo = mid;
    else
      hi = mid;
  }
  return lo;
}

}  // namespace

extern "C" {

// Encode n symbols. cdfs: row-major [cdf_rows, cdf_cols]; row r uses
// cdf_lengths[r] entries (cdf[0]=0, cdf[L-1]=2^16, L-2 real symbols, entry
// L-2..L-1 is the escape slot). offsets[r] maps symbol values to table slots:
// slot = value - offset. Values outside [0, L-2) escape to bypass coding.
// Returns byte length written to `out`, or -1 if capacity is insufficient.
int pct_rans_encode(const int32_t* symbols, const int32_t* indexes, int n,
                    const int32_t* cdfs, int cdf_rows, int cdf_cols,
                    const int32_t* cdf_lengths, const int32_t* offsets,
                    uint8_t* out, int capacity) {
  Encoder enc;
  // rANS is LIFO: process symbols in reverse so the decoder reads forward.
  for (int i = n - 1; i >= 0; --i) {
    int32_t idx = indexes[i];
    if (idx < 0 || idx >= cdf_rows) return -2;
    const int32_t* cdf = cdfs + (size_t)idx * cdf_cols;
    int len = cdf_lengths[idx];
    int max_value = len - 2;
    int32_t value = symbols[i] - offsets[idx];

    uint32_t raw_val = 0;
    bool escaped = false;
    if (value < 0) {
      raw_val = (uint32_t)(-2 * value - 1);
      value = max_value;
      escaped = true;
    } else if (value >= max_value) {
      raw_val = (uint32_t)(2 * (value - max_value));
      value = max_value;
      escaped = true;
    }

    if (escaped) {
      // Push in reverse of decode order: raw chunks (high..low), then the
      // chunk count (in saturating kMaxBypassVal increments, reversed).
      int n_bypass = 0;
      while ((raw_val >> (n_bypass * kBypassPrecision)) != 0) ++n_bypass;
      for (int j = n_bypass - 1; j >= 0; --j)
        enc.put_bits((raw_val >> (j * kBypassPrecision)) & kMaxBypassVal,
                     kBypassPrecision);
      int32_t val = n_bypass;
      // decode order: read kMaxBypassVal-saturated count then chunks; encode
      // the count pieces reversed (last piece first ... pushed last).
      std::vector<uint32_t> pieces;
      while (val >= (int32_t)kMaxBypassVal) {
        pieces.push_back(kMaxBypassVal);
        val -= kMaxBypassVal;
      }
      pieces.push_back((uint32_t)val);
      for (size_t j = pieces.size(); j-- > 0;)
        enc.put_bits(pieces[j], kBypassPrecision);
    }

    uint32_t start = (uint32_t)cdf[value];
    uint32_t freq = (uint32_t)(cdf[value + 1] - cdf[value]);
    if (freq == 0) return -3;  // malformed cdf
    enc.put(start, freq);
  }
  return enc.flush(out, capacity);
}

// Decode n symbols from `stream`. Mirrors pct_rans_encode.
int pct_rans_decode(const uint8_t* stream, int nbytes, const int32_t* indexes,
                    int n, const int32_t* cdfs, int cdf_rows, int cdf_cols,
                    const int32_t* cdf_lengths, const int32_t* offsets,
                    int32_t* out_symbols) {
  Decoder dec;
  dec.init(stream, nbytes);
  for (int i = 0; i < n; ++i) {
    int32_t idx = indexes[i];
    if (idx < 0 || idx >= cdf_rows) return -2;
    const int32_t* cdf = cdfs + (size_t)idx * cdf_cols;
    int len = cdf_lengths[idx];
    int max_value = len - 2;

    uint32_t cf = dec.get_cf();
    int value = find_symbol(cdf, len, cf);
    uint32_t start = (uint32_t)cdf[value];
    uint32_t freq = (uint32_t)(cdf[value + 1] - cdf[value]);
    dec.advance(start, freq);

    if (value == max_value) {
      // escape: read chunk count (saturated) then raw chunks (high..low
      // pushed => read low..high? see encoder: chunks pushed high..low before
      // count; decode reads count first, then chunks in high..low order).
      int n_bypass = 0;
      uint32_t piece = dec.get_bits(kBypassPrecision);
      n_bypass += (int)piece;
      while (piece == kMaxBypassVal) {
        piece = dec.get_bits(kBypassPrecision);
        n_bypass += (int)piece;
      }
      uint32_t raw_val = 0;
      for (int j = 0; j < n_bypass; ++j) {
        piece = dec.get_bits(kBypassPrecision);
        raw_val |= piece << (j * kBypassPrecision);
      }
      int32_t v;
      if (raw_val & 1)
        v = -(int32_t)((raw_val + 1) >> 1);  // raw = -2v-1
      else
        v = (int32_t)(raw_val >> 1) + max_value;  // raw = 2(v - max)
      out_symbols[i] = v + offsets[idx];
    } else {
      out_symbols[i] = value + offsets[idx];
    }
  }
  return 0;
}

}  // extern "C"
