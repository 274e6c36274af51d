// Lossless octree point-geometry coder for the pct framework (C ABI, ctypes).
//
// TPU-native replacement for the MPEG G-PCC (tmc13) subprocess the reference
// shells out to for its stride-8 latent coordinates (reference
// `shared/utils.py:169-240`, invoked per frame at `codec_pipeline.py:441-462`).
// Same job — lossless coding of a set of unique integer voxels — with a
// self-contained format:
//
//   header: [n: i32][min_xyz: 3 x i32][depth: u8]
//   body:   context-adaptive binary range coder over breadth-first octree
//           occupancy bytes (Morton order)
//
// Contexts: child slot index x occupied-siblings-so-far x parent occupancy
// popcount x level parity. The binary range coder is the classic public
// carry-counting (LZMA-style) construction.
//
// The decoder emits points in Morton (BFS) order; callers re-sort into the
// framework's canonical lexicographic order.
//
// Build: g++ -O2 -shared -fPIC -o libgpcc.so gpcc.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kProbBits = 11;
constexpr uint16_t kProbInit = 1 << (kProbBits - 1);
constexpr int kAdapt = 5;

struct RangeEncoder {
  uint64_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint8_t cache = 0;
  int64_t cache_size = 1;
  std::vector<uint8_t> out;

  inline void shift_low() {
    if ((uint32_t)low < 0xFF000000u || (int)(low >> 32) != 0) {
      uint8_t carry = (uint8_t)(low >> 32);
      uint8_t temp = cache;
      do {
        out.push_back((uint8_t)(temp + carry));
        temp = 0xFF;
      } while (--cache_size);
      cache = (uint8_t)(low >> 24);
    }
    cache_size++;
    low = (uint32_t)low << 8;
  }

  inline void encode_bit(uint16_t* prob, int bit) {
    uint32_t bound = (range >> kProbBits) * (*prob);
    if (bit == 0) {
      range = bound;
      *prob += ((1 << kProbBits) - *prob) >> kAdapt;
    } else {
      low += bound;
      range -= bound;
      *prob -= *prob >> kAdapt;
    }
    if (range < (1u << 24)) {
      range <<= 8;
      shift_low();
    }
  }

  void flush() {
    for (int i = 0; i < 5; ++i) shift_low();
  }
};

struct RangeDecoder {
  uint32_t range = 0xFFFFFFFFu;
  uint32_t code = 0;
  const uint8_t* buf;
  int nbytes;
  int pos = 0;

  inline uint8_t next() { return pos < nbytes ? buf[pos++] : 0; }

  void init(const uint8_t* b, int n) {
    buf = b;
    nbytes = n;
    next();  // first byte is always 0 (encoder cache priming)
    for (int i = 0; i < 4; ++i) code = (code << 8) | next();
  }

  inline int decode_bit(uint16_t* prob) {
    uint32_t bound = (range >> kProbBits) * (*prob);
    int bit;
    if (code < bound) {
      range = bound;
      *prob += ((1 << kProbBits) - *prob) >> kAdapt;
      bit = 0;
    } else {
      code -= bound;
      range -= bound;
      *prob -= *prob >> kAdapt;
      bit = 1;
    }
    if (range < (1u << 24)) {
      range <<= 8;
      code = (code << 8) | next();
    }
    return bit;
  }
};

// ctx = (((level & 1) * 8 + parent_pop_m1) * 8 + siblings_so_far) * 8 + slot
constexpr int kNumCtx = 2 * 8 * 8 * 8;

inline int ctx_index(int level, int parent_pop, int siblings, int slot) {
  int pp = parent_pop > 8 ? 7 : parent_pop - 1;
  if (pp < 0) pp = 0;
  int sib = siblings > 7 ? 7 : siblings;
  return (((level & 1) * 8 + pp) * 8 + sib) * 8 + slot;
}

inline uint64_t morton3(uint32_t x, uint32_t y, uint32_t z, int depth) {
  uint64_t m = 0;
  for (int i = depth - 1; i >= 0; --i) {
    m = (m << 3) | (((x >> i) & 1u) << 2) | (((y >> i) & 1u) << 1) | ((z >> i) & 1u);
  }
  return m;
}

struct Node {
  uint32_t start, end;  // range in the sorted morton array
  uint8_t parent_pop;
};

}  // namespace

extern "C" {

// Encode n unique integer points (xyz row-major). Returns bytes written, or
// -1 on insufficient capacity.
int pct_gpcc_encode(const int32_t* xyz, int n, uint8_t* out, int capacity) {
  if (n < 0) return -1;
  int header = 4 + 12 + 1;
  if (capacity < header) return -1;
  int32_t mn[3] = {0, 0, 0};
  if (n > 0) {
    mn[0] = mn[1] = mn[2] = INT32_MAX;
    for (int i = 0; i < n; ++i)
      for (int d = 0; d < 3; ++d) mn[d] = std::min(mn[d], xyz[3 * i + d]);
  }
  uint32_t maxv = 0;
  for (int i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) maxv = std::max(maxv, (uint32_t)(xyz[3 * i + d] - mn[d]));
  int depth = 0;
  while (depth < 32 && (1u << depth) <= maxv) ++depth;
  if (depth > 21) return -4;  // 3*depth Morton bits must fit in uint64

  std::memcpy(out, &n, 4);
  std::memcpy(out + 4, mn, 12);
  out[16] = (uint8_t)depth;
  if (n == 0) return header;

  std::vector<uint64_t> codes(n);
  for (int i = 0; i < n; ++i)
    codes[i] = morton3((uint32_t)(xyz[3 * i] - mn[0]), (uint32_t)(xyz[3 * i + 1] - mn[1]),
                       (uint32_t)(xyz[3 * i + 2] - mn[2]), depth);
  std::sort(codes.begin(), codes.end());

  RangeEncoder rc;
  std::vector<uint16_t> probs(kNumCtx, kProbInit);
  std::vector<Node> nodes{{0u, (uint32_t)n, 8}}, next_nodes;

  for (int level = 0; level < depth; ++level) {
    int shift = 3 * (depth - 1 - level);
    next_nodes.clear();
    for (const Node& nd : nodes) {
      // find contiguous child runs (morton-sorted)
      uint32_t bounds[9];
      bounds[0] = nd.start;
      uint32_t p = nd.start;
      for (int c = 0; c < 8; ++c) {
        while (p < nd.end && (int)((codes[p] >> shift) & 7) == c) ++p;
        bounds[c + 1] = p;
      }
      int occupancy = 0, sib = 0;
      for (int c = 0; c < 8; ++c) {
        int bit = bounds[c + 1] > bounds[c];
        rc.encode_bit(&probs[ctx_index(level, nd.parent_pop, sib, c)], bit);
        if (bit) {
          occupancy |= 1 << c;
          ++sib;
        }
      }
      if (level + 1 < depth) {
        for (int c = 0; c < 8; ++c)
          if (bounds[c + 1] > bounds[c])
            next_nodes.push_back({bounds[c], bounds[c + 1], (uint8_t)sib});
      }
    }
    nodes.swap(next_nodes);
  }
  rc.flush();
  if ((int)rc.out.size() + header > capacity) return -1;
  std::memcpy(out + header, rc.out.data(), rc.out.size());
  return header + (int)rc.out.size();
}

// Decode. Returns number of points written (Morton order), or -1 if the
// capacity (in points) is insufficient / stream malformed.
int pct_gpcc_decode(const uint8_t* in, int nbytes, int32_t* out_xyz, int capacity_points) {
  if (nbytes < 17) return -1;
  int32_t n;
  int32_t mn[3];
  std::memcpy(&n, in, 4);
  std::memcpy(mn, in + 4, 12);
  int depth = in[16];
  if (n < 0 || n > capacity_points) return -1;
  if (n == 0) return 0;

  RangeDecoder rc;
  rc.init(in + 17, nbytes - 17);
  std::vector<uint16_t> probs(kNumCtx, kProbInit);

  struct DNode {
    uint64_t prefix;
    uint8_t parent_pop;
  };
  std::vector<DNode> nodes{{0ull, 8}}, next_nodes;

  for (int level = 0; level < depth; ++level) {
    next_nodes.clear();
    for (const DNode& nd : nodes) {
      int sib = 0;
      for (int c = 0; c < 8; ++c) {
        int bit = rc.decode_bit(&probs[ctx_index(level, nd.parent_pop, sib, c)]);
        if (bit) {
          next_nodes.push_back({(nd.prefix << 3) | (uint64_t)c, 0});
          ++sib;
        }
      }
      // fix parent_pop for the children just appended
      for (size_t k = next_nodes.size() - sib; k < next_nodes.size(); ++k)
        next_nodes[k].parent_pop = (uint8_t)sib;
    }
    nodes.swap(next_nodes);
    if ((int)nodes.size() > capacity_points && level + 1 < depth) return -1;
  }
  if ((int)nodes.size() != n) return -1;
  for (int i = 0; i < n; ++i) {
    uint64_t m = nodes[i].prefix;
    uint32_t x = 0, y = 0, z = 0;
    for (int b = 0; b < depth; ++b) {
      x |= (uint32_t)((m >> (3 * b + 2)) & 1u) << b;
      y |= (uint32_t)((m >> (3 * b + 1)) & 1u) << b;
      z |= (uint32_t)((m >> (3 * b)) & 1u) << b;
    }
    out_xyz[3 * i] = (int32_t)x + mn[0];
    out_xyz[3 * i + 1] = (int32_t)y + mn[1];
    out_xyz[3 * i + 2] = (int32_t)z + mn[2];
  }
  return n;
}

}  // extern "C"
