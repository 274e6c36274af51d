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
// Contexts (v2, depth byte high bit set): child slot index x occupied
// face-neighbor mask for the 3 neighbor nodes the child touches x decoded
// same-axis sibling mask x parent-occupancy-popcount bucket x level parity.
// The face-neighbor pattern is the tmc13-style spatial context: all nodes of
// the current level are known to the decoder before any of the level's child
// bits, so each node looks up its 6 face neighbors in the level's
// Morton-sorted node list. v1 streams (slot x siblings-so-far x popcount x
// parity, no spatial context) still decode. The binary range coder is the
// classic public carry-counting (LZMA-style) construction.
//
// The decoder emits points in Morton (BFS) order; callers re-sort into the
// framework's canonical lexicographic order.
//
// Build: g++ -O2 -shared -fPIC -o libgpcc.so gpcc.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#include "priors_v3.h"

namespace {

constexpr int kProbBits = 11;
constexpr uint16_t kProbInit = 1 << (kProbBits - 1);
constexpr int kAdapt = 5;
// v3 (header flag 0x40): initialize contexts from the pretrained prior
// table instead of p=0.5 — small streams (latent skeletons, ~400-800
// points) otherwise spend 2-3x their conditional-entropy bound on cold
// contexts (measured: scripts/octree_bound.py, PERF.md round 5). Priors
// start "warm" (cnt=kPriorWarm) so stage-2 adaptation doesn't stampede
// away from a good prior on the first occurrence; mismatched contexts
// still adapt within a few bits at shift 4.
constexpr int kPriorWarm = 8;

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

  // Staged-adaptation bit: fresh contexts move fast toward their empirical
  // probability (shift 2), warm ones anneal to the steady shift — recovers
  // most of the context-dilution loss of the fine spatial table on small
  // streams (cold contexts otherwise spend ~32 bits stuck near p=0.5).
  inline void encode_bit_staged(uint16_t* prob, uint8_t* cnt, int bit) {
    int shift = *cnt < 8 ? 2 : (*cnt < 32 ? 4 : kAdapt);
    if (*cnt < 255) ++*cnt;
    uint32_t bound = (range >> kProbBits) * (*prob);
    if (bit == 0) {
      range = bound;
      *prob += ((1 << kProbBits) - *prob) >> shift;
    } else {
      low += bound;
      range -= bound;
      *prob -= *prob >> shift;
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

  inline int decode_bit_staged(uint16_t* prob, uint8_t* cnt) {
    int shift = *cnt < 8 ? 2 : (*cnt < 32 ? 4 : kAdapt);
    if (*cnt < 255) ++*cnt;
    uint32_t bound = (range >> kProbBits) * (*prob);
    int bit;
    if (code < bound) {
      range = bound;
      *prob += ((1 << kProbBits) - *prob) >> shift;
      bit = 0;
    } else {
      code -= bound;
      range -= bound;
      *prob -= *prob >> shift;
      bit = 1;
    }
    if (range < (1u << 24)) {
      range <<= 8;
      code = (code << 8) | next();
    }
    return bit;
  }
};

// v1 ctx = (((level & 1) * 8 + parent_pop_m1) * 8 + siblings_so_far) * 8 + slot
constexpr int kNumCtx = 2 * 8 * 8 * 8;

inline int ctx_index(int level, int parent_pop, int siblings, int slot) {
  int pp = parent_pop > 8 ? 7 : parent_pop - 1;
  if (pp < 0) pp = 0;
  int sib = siblings > 7 ? 7 : siblings;
  return (((level & 1) * 8 + pp) * 8 + sib) * 8 + slot;
}

// v2 ctx = ((((level&1)*4 + pop_bucket)*8 + slot)*8 + adj_sib_mask)*8 + neigh_mask
// plus, for streams of >= kSibCtxMinPoints points, a siblings-so-far bucket
// (0/1/2/3+) as a 4th-order dimension: measured -4..-8% on dense >=150k-point
// surfaces but +0.5-3% dilution on small streams, so it keys off the header's
// n — known to BOTH sides before any occupancy bit, no format change.
constexpr int kNumCtx2 = 2 * 4 * 8 * 8 * 8 * 4;
constexpr int kSibCtxMinPoints = 32768;

inline int sib_bucket(int occ) {
  int s = __builtin_popcount((unsigned)occ);
  return s > 3 ? 3 : s;
}

inline int pop_bucket(int parent_pop) {
  if (parent_pop <= 1) return 0;
  if (parent_pop == 2) return 1;
  if (parent_pop <= 4) return 2;
  return 3;
}

// Child slot bits: slot = (x<<2)|(y<<1)|z (matches morton3). The 3 same-axis
// siblings of slot c are c^4, c^2, c^1; a sibling's bit is known iff its slot
// index is lower (already coded within this node). The 3 face neighbors the
// child touches are the parent-level nodes offset +-1 along each axis on the
// child's side (x side = (cx ? +1 : -1), etc.).
inline int ctx2_index(int level, int parent_pop, int slot, int occupancy_so_far,
                      int neigh6, bool use_sib) {
  int adj = 0;
  for (int a = 0; a < 3; ++a) {
    int sib = slot ^ (4 >> a);  // 4, 2, 1
    if (sib < slot && ((occupancy_so_far >> sib) & 1)) adj |= 1 << a;
  }
  // neigh6 bit layout: (+x, -x, +y, -y, +z, -z) = bits 5..0
  int nb = 0;
  if ((neigh6 >> ((slot & 4) ? 5 : 4)) & 1) nb |= 4;  // x side
  if ((neigh6 >> ((slot & 2) ? 3 : 2)) & 1) nb |= 2;  // y side
  if ((neigh6 >> ((slot & 1) ? 1 : 0)) & 1) nb |= 1;  // z side
  int base = ((((level & 1) * 4 + pop_bucket(parent_pop)) * 8 + slot) * 8 + adj) * 8 + nb;
  return base * 4 + (use_sib ? sib_bucket(occupancy_so_far) : 0);
}

inline uint64_t morton3(uint32_t x, uint32_t y, uint32_t z, int depth) {
  uint64_t m = 0;
  for (int i = depth - 1; i >= 0; --i) {
    m = (m << 3) | (((x >> i) & 1u) << 2) | (((y >> i) & 1u) << 1) | ((z >> i) & 1u);
  }
  return m;
}

inline void morton_xyz(uint64_t m, int bits, uint32_t* x, uint32_t* y, uint32_t* z) {
  *x = *y = *z = 0;
  for (int b = 0; b < bits; ++b) {
    *x |= (uint32_t)((m >> (3 * b + 2)) & 1u) << b;
    *y |= (uint32_t)((m >> (3 * b + 1)) & 1u) << b;
    *z |= (uint32_t)((m >> (3 * b)) & 1u) << b;
  }
}

// 6-bit face-neighbor occupancy of the node `prefix` (level-`bits` Morton
// code) against the Morton-sorted node list of its level.
inline int neighbor_mask(uint64_t prefix, int bits, const uint64_t* level_nodes,
                         size_t n_nodes) {
  uint32_t x, y, z;
  morton_xyz(prefix, bits, &x, &y, &z);
  uint32_t lim = bits >= 21 ? 0x1FFFFFu : ((1u << bits) - 1u);
  int mask = 0;
  const int32_t d[6][3] = {{1, 0, 0}, {-1, 0, 0}, {0, 1, 0},
                           {0, -1, 0}, {0, 0, 1}, {0, 0, -1}};
  for (int i = 0; i < 6; ++i) {
    int64_t nx = (int64_t)x + d[i][0], ny = (int64_t)y + d[i][1],
            nz = (int64_t)z + d[i][2];
    if (nx < 0 || ny < 0 || nz < 0 || nx > lim || ny > lim || nz > lim) continue;
    uint64_t nm = morton3((uint32_t)nx, (uint32_t)ny, (uint32_t)nz, bits);
    const uint64_t* it = std::lower_bound(level_nodes, level_nodes + n_nodes, nm);
    if (it != level_nodes + n_nodes && *it == nm) mask |= 1 << (5 - i);
  }
  return mask;
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
  // 0x80: v2 neighbor contexts; 0x40: v3 prior-initialized contexts (small
  // streams only — the sibling-context threshold doubles as the prior
  // regime boundary). depth occupies the low 6 bits (<= 21 always).
  const bool use_prior = n > 0 && n < kSibCtxMinPoints;
  out[16] = (uint8_t)(depth | 0x80 | (use_prior ? 0x40 : 0));
  if (n == 0) return header;

  std::vector<uint64_t> codes(n);
  for (int i = 0; i < n; ++i)
    codes[i] = morton3((uint32_t)(xyz[3 * i] - mn[0]), (uint32_t)(xyz[3 * i + 1] - mn[1]),
                       (uint32_t)(xyz[3 * i + 2] - mn[2]), depth);
  std::sort(codes.begin(), codes.end());

  RangeEncoder rc;
  const bool use_sib = n >= kSibCtxMinPoints;
  std::vector<uint16_t> probs(kNumCtx2, kProbInit);
  std::vector<uint8_t> cnts(kNumCtx2, 0);
  if (use_prior) {
    probs.assign(kPriorProbsV3, kPriorProbsV3 + kNumCtx2);
    cnts.assign(kNumCtx2, (uint8_t)kPriorWarm);
  }
  std::vector<Node> nodes{{0u, (uint32_t)n, 8}}, next_nodes;
  std::vector<uint64_t> lvl_prefixes;

  for (int level = 0; level < depth; ++level) {
    int shift = 3 * (depth - 1 - level);
    // Morton codes of this level's nodes (sorted: BFS preserves order) —
    // the spatial table every node's face-neighbor lookup runs against
    lvl_prefixes.resize(nodes.size());
    int pshift = 3 * (depth - level);
    for (size_t i = 0; i < nodes.size(); ++i)
      lvl_prefixes[i] = codes[nodes[i].start] >> pshift;
    next_nodes.clear();
    for (size_t ni = 0; ni < nodes.size(); ++ni) {
      const Node& nd = nodes[ni];
      int neigh6 = neighbor_mask(lvl_prefixes[ni], level, lvl_prefixes.data(),
                                 lvl_prefixes.size());
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
        int cx2 = ctx2_index(level, nd.parent_pop, c, occupancy, neigh6, use_sib);
        rc.encode_bit_staged(&probs[cx2], &cnts[cx2], bit);
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
  bool v2 = (in[16] & 0x80) != 0;
  bool use_prior = v2 && (in[16] & 0x40) != 0;
  int depth = in[16] & (v2 ? 0x3F : 0x7F);
  if (n < 0 || n > capacity_points) return -1;
  if (n == 0) return 0;

  RangeDecoder rc;
  rc.init(in + 17, nbytes - 17);
  const bool use_sib = n >= kSibCtxMinPoints;
  std::vector<uint16_t> probs(v2 ? kNumCtx2 : kNumCtx, kProbInit);
  std::vector<uint8_t> cnts(v2 ? kNumCtx2 : 0, 0);
  if (use_prior) {
    probs.assign(kPriorProbsV3, kPriorProbsV3 + kNumCtx2);
    cnts.assign(kNumCtx2, (uint8_t)kPriorWarm);
  }

  struct DNode {
    uint64_t prefix;
    uint8_t parent_pop;
  };
  std::vector<DNode> nodes{{0ull, 8}}, next_nodes;
  std::vector<uint64_t> lvl_prefixes;

  for (int level = 0; level < depth; ++level) {
    if (v2) {
      lvl_prefixes.resize(nodes.size());
      for (size_t i = 0; i < nodes.size(); ++i) lvl_prefixes[i] = nodes[i].prefix;
    }
    next_nodes.clear();
    for (size_t ni = 0; ni < nodes.size(); ++ni) {
      const DNode& nd = nodes[ni];
      int neigh6 = v2 ? neighbor_mask(nd.prefix, level, lvl_prefixes.data(),
                                      lvl_prefixes.size())
                      : 0;
      int sib = 0, occupancy = 0;
      for (int c = 0; c < 8; ++c) {
        int bit;
        if (v2) {
          int cx2 = ctx2_index(level, nd.parent_pop, c, occupancy, neigh6, use_sib);
          bit = rc.decode_bit_staged(&probs[cx2], &cnts[cx2]);
        } else {
          bit = rc.decode_bit(&probs[ctx_index(level, nd.parent_pop, sib, c)]);
        }
        if (bit) {
          next_nodes.push_back({(nd.prefix << 3) | (uint64_t)c, 0});
          occupancy |= 1 << c;
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
