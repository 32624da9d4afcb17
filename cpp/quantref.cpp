/* libquantref implementation. See quantref.h for the normative codec spec. */
#include "quantref.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <queue>
#include <vector>

namespace {

inline float qmax_for_bits(int bits) {
  return static_cast<float>((1 << (bits - 1)) - 1);
}

/* Quantize one contiguous span with a single scale. */
void quantize_span(const float* x, int64_t n, float qmax, float* scale_out,
                   int8_t* codes_out) {
  float absmax = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = std::fabs(x[i]);
    if (a > absmax) absmax = a;
  }
  float scale = (absmax == 0.0f) ? 1.0f : absmax / qmax;
  *scale_out = scale;
  for (int64_t i = 0; i < n; ++i) {
    /* float32 divide then round-half-to-even, matching np.round(x/scale). */
    float q = std::nearbyintf(x[i] / scale);
    if (q > qmax) q = qmax;
    if (q < -qmax) q = -qmax;
    codes_out[i] = static_cast<int8_t>(q);
  }
}

}  // namespace

extern "C" {

int qr_quantize(const float* x, int64_t n, int bits, float* scale_out,
                int8_t* codes_out) {
  if (bits < 2 || bits > 8 || n < 0) return 1;
  quantize_span(x, n, qmax_for_bits(bits), scale_out, codes_out);
  return 0;
}

int qr_quantize_grouped(const float* x, int64_t rows, int64_t cols, int bits,
                        int64_t group_size, float* scales_out,
                        int8_t* codes_out) {
  if (bits < 2 || bits > 8) return 1;
  if (group_size <= 0 || cols % group_size != 0) return 1;
  const float qmax = qmax_for_bits(bits);
  const int64_t groups_per_row = cols / group_size;
  for (int64_t r = 0; r < rows; ++r) {
    for (int64_t g = 0; g < groups_per_row; ++g) {
      const int64_t off = r * cols + g * group_size;
      quantize_span(x + off, group_size, qmax,
                    scales_out + r * groups_per_row + g, codes_out + off);
    }
  }
  return 0;
}

void qr_dequantize(const int8_t* codes, int64_t n, float scale, float* out) {
  for (int64_t i = 0; i < n; ++i)
    out[i] = static_cast<float>(codes[i]) * scale;
}

void qr_dequantize_grouped(const int8_t* codes, int64_t rows, int64_t cols,
                           int64_t group_size, const float* scales,
                           float* out) {
  const int64_t groups_per_row = cols / group_size;
  for (int64_t r = 0; r < rows; ++r) {
    for (int64_t g = 0; g < groups_per_row; ++g) {
      const float s = scales[r * groups_per_row + g];
      const int64_t off = r * cols + g * group_size;
      for (int64_t i = 0; i < group_size; ++i)
        out[off + i] = static_cast<float>(codes[off + i]) * s;
    }
  }
}

int64_t qr_pack_int4(const int8_t* codes, int64_t n, uint8_t* out) {
  const int64_t nbytes = (n + 1) / 2;
  for (int64_t j = 0; j < n / 2; ++j) {
    uint8_t lo = static_cast<uint8_t>(codes[2 * j] + 8) & 0xF;
    uint8_t hi = static_cast<uint8_t>(codes[2 * j + 1] + 8) & 0xF;
    out[j] = static_cast<uint8_t>((hi << 4) | lo);
  }
  if (n & 1) {
    uint8_t lo = static_cast<uint8_t>(codes[n - 1] + 8) & 0xF;
    out[nbytes - 1] = static_cast<uint8_t>((8u << 4) | lo); /* pad code 0 */
  }
  return nbytes;
}

int64_t qr_unpack_int4(const uint8_t* packed, int64_t n, int8_t* codes_out) {
  for (int64_t i = 0; i < n; ++i) {
    uint8_t b = packed[i / 2];
    uint8_t nib = (i & 1) ? (b >> 4) : (b & 0xF);
    codes_out[i] = static_cast<int8_t>(static_cast<int>(nib) - 8);
  }
  return n;
}

/* ── Codebook ("bin-lookup") variant ───────────────────────────────── */

/* NF4 constants (QLoRA §3): the 16 quantiles of N(0,1) renormalized to
 * [-1, 1], with 0 as an exact entry. Normative for this oracle. */
const float QR_NF4_TABLE[16] = {
    -1.0f,
    -0.6961928009986877f,
    -0.5250730514526367f,
    -0.39491748809814453f,
    -0.28444138169288635f,
    -0.18477343022823334f,
    -0.09105003625154495f,
    0.0f,
    0.07958029955625534f,
    0.16093020141124725f,
    0.24611230194568634f,
    0.33791524171829224f,
    0.44070982933044434f,
    0.5626170039176941f,
    0.7229568362236023f,
    1.0f,
};

namespace {

/* Quantize one contiguous span against a 16-entry codebook: scale =
 * absmax, bin = count of midpoints strictly below x/scale, code = bin-8. */
void quantize_lut_span(const float* x, int64_t n, const float* lut,
                       float* scale_out, int8_t* codes_out) {
  float absmax = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = std::fabs(x[i]);
    if (a > absmax) absmax = a;
  }
  float scale = (absmax == 0.0f) ? 1.0f : absmax;
  *scale_out = scale;
  float mid[15];
  for (int i = 0; i < 15; ++i) mid[i] = (lut[i] + lut[i + 1]) / 2.0f;
  for (int64_t i = 0; i < n; ++i) {
    float xn = x[i] / scale;
    int bin = 0;
    for (int t = 0; t < 15; ++t) bin += (xn > mid[t]) ? 1 : 0;
    codes_out[i] = static_cast<int8_t>(bin - 8);
  }
}

}  // namespace

int qr_quantize_lut(const float* x, int64_t n, const float* lut,
                    float* scale_out, int8_t* codes_out) {
  if (n < 0 || lut == nullptr) return 1;
  for (int i = 0; i < 15; ++i)
    if (!(lut[i] < lut[i + 1])) return 1; /* must be strictly ascending */
  quantize_lut_span(x, n, lut, scale_out, codes_out);
  return 0;
}

int qr_quantize_lut_grouped(const float* x, int64_t rows, int64_t cols,
                            int64_t group_size, const float* lut,
                            float* scales_out, int8_t* codes_out) {
  if (lut == nullptr) return 1;
  if (group_size <= 0 || cols % group_size != 0) return 1;
  for (int i = 0; i < 15; ++i)
    if (!(lut[i] < lut[i + 1])) return 1;
  const int64_t groups_per_row = cols / group_size;
  for (int64_t r = 0; r < rows; ++r) {
    for (int64_t g = 0; g < groups_per_row; ++g) {
      const int64_t off = r * cols + g * group_size;
      quantize_lut_span(x + off, group_size, lut,
                        scales_out + r * groups_per_row + g, codes_out + off);
    }
  }
  return 0;
}

void qr_dequantize_lut(const int8_t* codes, int64_t n, const float* lut,
                       float scale, float* out) {
  for (int64_t i = 0; i < n; ++i)
    out[i] = lut[static_cast<int>(codes[i]) + 8] * scale;
}

void qr_dequantize_lut_grouped(const int8_t* codes, int64_t rows,
                               int64_t cols, int64_t group_size,
                               const float* lut, const float* scales,
                               float* out) {
  const int64_t groups_per_row = cols / group_size;
  for (int64_t r = 0; r < rows; ++r) {
    for (int64_t g = 0; g < groups_per_row; ++g) {
      const float s = scales[r * groups_per_row + g];
      const int64_t off = r * cols + g * group_size;
      for (int64_t i = 0; i < group_size; ++i)
        out[off + i] = lut[static_cast<int>(codes[off + i]) + 8] * s;
    }
  }
}

double qr_mse(const float* a, const float* b, int64_t n) {
  double acc = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    double d = static_cast<double>(a[i]) - static_cast<double>(b[i]);
    acc += d * d;
  }
  return n > 0 ? acc / static_cast<double>(n) : 0.0;
}

/* ── Canonical Huffman ─────────────────────────────────────────────── */

namespace {

constexpr int64_t kHeaderSize = 4 /*magic*/ + 1 /*ver*/ + 1 /*flags*/ +
                                8 /*n*/;
constexpr int64_t kTableSize = 256;

/* Deterministic Huffman code lengths from a byte histogram.
 * Tie-break: order by (count, order); leaf order = symbol, internal
 * order = 256 + creation index. Returns lengths[256] (0 = unused). */
void huffman_lengths(const uint64_t hist[256], uint8_t lengths[256]) {
  struct Node {
    uint64_t count;
    int32_t order;
    int32_t left, right;  /* -1 for leaf */
    int32_t symbol;       /* -1 for internal */
  };
  std::vector<Node> nodes;
  using QE = std::pair<uint64_t, int32_t>;  /* (count, node index) — but
      ordering must be by (count, order), so store order in the key. */
  struct Cmp {
    const std::vector<Node>* nodes;
    bool operator()(int32_t a, int32_t b) const {
      const Node& na = (*nodes)[a];
      const Node& nb = (*nodes)[b];
      if (na.count != nb.count) return na.count > nb.count;  /* min-heap */
      return na.order > nb.order;
    }
  };
  (void)sizeof(QE);
  std::memset(lengths, 0, 256);
  for (int s = 0; s < 256; ++s)
    if (hist[s] > 0)
      nodes.push_back({hist[s], s, -1, -1, s});
  if (nodes.empty()) return;
  if (nodes.size() == 1) {
    lengths[nodes[0].symbol] = 1;
    return;
  }
  Cmp cmp{&nodes};
  std::priority_queue<int32_t, std::vector<int32_t>, Cmp> pq(cmp);
  for (int32_t i = 0; i < static_cast<int32_t>(nodes.size()); ++i) pq.push(i);
  int32_t next_order = 256;
  while (pq.size() > 1) {
    int32_t a = pq.top(); pq.pop();
    int32_t b = pq.top(); pq.pop();
    Node merged{nodes[a].count + nodes[b].count, next_order++, a, b, -1};
    nodes.push_back(merged);
    pq.push(static_cast<int32_t>(nodes.size() - 1));
  }
  /* DFS depths. */
  int32_t root = pq.top();
  std::vector<std::pair<int32_t, int>> stack{{root, 0}};
  while (!stack.empty()) {
    auto [idx, depth] = stack.back();
    stack.pop_back();
    const Node& nd = nodes[idx];
    if (nd.symbol >= 0) {
      lengths[nd.symbol] = static_cast<uint8_t>(depth);
    } else {
      stack.push_back({nd.left, depth + 1});
      stack.push_back({nd.right, depth + 1});
    }
  }
}

/* Canonical code assignment: symbols sorted by (length, symbol). */
void canonical_codes(const uint8_t lengths[256], uint32_t codes[256]) {
  std::vector<int> syms;
  for (int s = 0; s < 256; ++s)
    if (lengths[s] > 0) syms.push_back(s);
  std::sort(syms.begin(), syms.end(), [&](int a, int b) {
    if (lengths[a] != lengths[b]) return lengths[a] < lengths[b];
    return a < b;
  });
  uint32_t code = 0;
  int prev_len = 0;
  for (int s : syms) {
    code <<= (lengths[s] - prev_len);
    codes[s] = code;
    ++code;
    prev_len = lengths[s];
  }
}

void write_u64(uint8_t* p, uint64_t v) {
  for (int i = 0; i < 8; ++i) p[i] = static_cast<uint8_t>(v >> (8 * i));
}
uint64_t read_u64(const uint8_t* p) {
  uint64_t v = 0;
  for (int i = 0; i < 8; ++i) v |= static_cast<uint64_t>(p[i]) << (8 * i);
  return v;
}

}  // namespace

int64_t qr_entropy_bound(int64_t n) {
  return kHeaderSize + kTableSize + n + 8;
}

int64_t qr_entropy_encode(const uint8_t* data, int64_t n, uint8_t* out,
                          int64_t out_cap) {
  if (n < 0 || out_cap < qr_entropy_bound(0)) return -1;
  uint64_t hist[256] = {0};
  for (int64_t i = 0; i < n; ++i) ++hist[data[i]];
  uint8_t lengths[256];
  huffman_lengths(hist, lengths);
  /* Total payload bits. */
  uint64_t total_bits = 0;
  for (int s = 0; s < 256; ++s) total_bits += hist[s] * lengths[s];
  const int64_t payload_bytes = static_cast<int64_t>((total_bits + 7) / 8);
  const bool store_raw = payload_bytes >= n;  /* incompressible → stored */
  const int64_t body = store_raw ? n : kTableSize + payload_bytes;
  const int64_t total = kHeaderSize + body;
  if (total > out_cap) return -1;
  std::memcpy(out, "QREF", 4);
  out[4] = 1; /* version */
  out[5] = store_raw ? 1 : 0;
  write_u64(out + 6, static_cast<uint64_t>(n));
  uint8_t* p = out + kHeaderSize;
  if (store_raw) {
    std::memcpy(p, data, static_cast<size_t>(n));
    return total;
  }
  std::memcpy(p, lengths, kTableSize);
  p += kTableSize;
  uint32_t codes[256] = {0};
  canonical_codes(lengths, codes);
  /* MSB-first bit writer. */
  uint64_t bitbuf = 0;
  int nbits = 0;
  int64_t written = 0;
  for (int64_t i = 0; i < n; ++i) {
    int s = data[i];
    bitbuf = (bitbuf << lengths[s]) | codes[s];
    nbits += lengths[s];
    while (nbits >= 8) {
      p[written++] = static_cast<uint8_t>(bitbuf >> (nbits - 8));
      nbits -= 8;
    }
  }
  if (nbits > 0)
    p[written++] = static_cast<uint8_t>(bitbuf << (8 - nbits));
  return kHeaderSize + kTableSize + written;
}

int64_t qr_entropy_decoded_size(const uint8_t* comp, int64_t comp_len) {
  if (comp_len < kHeaderSize || std::memcmp(comp, "QREF", 4) != 0 ||
      comp[4] != 1)
    return -1;
  return static_cast<int64_t>(read_u64(comp + 6));
}

int64_t qr_entropy_decode(const uint8_t* comp, int64_t comp_len, uint8_t* out,
                          int64_t out_cap) {
  int64_t n = qr_entropy_decoded_size(comp, comp_len);
  if (n < 0 || n > out_cap) return -1;
  const bool store_raw = comp[5] & 1;
  const uint8_t* p = comp + kHeaderSize;
  if (store_raw) {
    if (comp_len < kHeaderSize + n) return -1;
    std::memcpy(out, p, static_cast<size_t>(n));
    return n;
  }
  if (comp_len < kHeaderSize + kTableSize) return -1;
  const uint8_t* lengths = p;
  p += kTableSize;
  const uint8_t* end = comp + comp_len;
  /* Canonical decode tables: for each length L, first code value and index
   * into the (length,symbol)-sorted symbol list. */
  int max_len = 0;
  for (int s = 0; s < 256; ++s) max_len = std::max<int>(max_len, lengths[s]);
  if (max_len == 0) return n == 0 ? 0 : -1;
  std::vector<int> sorted_syms;
  for (int L = 1; L <= max_len; ++L)
    for (int s = 0; s < 256; ++s)
      if (lengths[s] == L) sorted_syms.push_back(s);
  std::vector<uint64_t> first_code(max_len + 2, 0);
  std::vector<int> first_idx(max_len + 2, 0);
  {
    uint64_t code = 0;
    int idx = 0;
    for (int L = 1; L <= max_len; ++L) {
      code <<= 1;
      first_code[L] = code;
      first_idx[L] = idx;
      int cnt = 0;
      for (int s = 0; s < 256; ++s)
        if (lengths[s] == L) ++cnt;
      code += cnt;
      idx += cnt;
    }
    first_idx[max_len + 1] = idx;  /* sentinel: total symbol count */
  }
  /* MSB-first bit reader. */
  uint64_t bitbuf = 0;
  int nbits = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t code = 0;
    int L = 0;
    int sym = -1;
    while (L < max_len) {
      if (nbits == 0) {
        if (p >= end) return -1;
        bitbuf = *p++;
        nbits = 8;
      }
      code = (code << 1) | ((bitbuf >> (nbits - 1)) & 1);
      --nbits;
      ++L;
      const int cnt = first_idx[L + 1] - first_idx[L];
      if (cnt > 0 && code >= first_code[L] &&
          code < first_code[L] + static_cast<uint64_t>(cnt)) {
        sym = sorted_syms[first_idx[L] + static_cast<int>(code - first_code[L])];
        break;
      }
    }
    if (sym < 0) return -1;
    out[i] = static_cast<uint8_t>(sym);
  }
  return n;
}

}  // extern "C"
