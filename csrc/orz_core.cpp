// orz-tpu native host codec.
//
// Exact implementation of the ORZ stream format's chunk codec (the L1-L3
// layers: bit coder / Huffman / symrank / ROLZ matcher / LZ core), exposed
// through a C ABI for the Python container layer (orz_tpu/container.py) and
// the TPU-hybrid encoder.  Semantics are pinned by the golden Python model
// (orz_tpu/golden/) and, transitively, by the reference (richox/orz
// src/{coder,huffman,symrank,matcher,lz}.rs); tests assert byte-equality
// between this codec and the golden model.
//
// Build: g++ -O3 -std=c++17 -fPIC -shared (see orz_tpu/native/__init__.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

// ---------------------------------------------------------------------------
// Format constants (see orz_tpu/constants.py for provenance)
// ---------------------------------------------------------------------------

static const int LZ_BLOCK_SIZE = (1 << 25) - 1;
static const int LZ_CHUNK_SIZE = 1 << 20;
static const int LZ_MATCH_MAX_LEN = 240;
static const int LZ_MATCH_MIN_LEN = 4;
static const int RING = 4094;                 // LZ_MF_BUCKET_ITEM_SIZE
static const int HASHN = 4627;                // LZ_MF_BUCKET_ITEM_HASH_SIZE
static const int NUM_BUCKETS = 256;
static const int LZ_ROID_SIZE = 22;
static const int LZ_LENID_SIZE = 6;
static const int NUM_SYMBOLS = 256 + LZ_ROID_SIZE * LZ_LENID_SIZE + 1;  // 389
static const int WORD_SYMBOL = NUM_SYMBOLS - 1;
static const int NUM_SR_CONTEXTS = 512;
static const int WORD_TABLE_SIZE = 1 << 15;
static const int MAX_CODE_LEN = 15;

struct OrzLZCfg {
  int32_t match_depth;
  int32_t lazy_match_depth1;
  int32_t lazy_match_depth2;
};

// ---------------------------------------------------------------------------
// Small helpers
// ---------------------------------------------------------------------------

static inline uint32_t load_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian host assumed (x86/ARM LE)
}
static inline uint16_t load_u16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}
static inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }

static inline bool is_alnum(uint8_t b) {
  return (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z');
}

// hash1/hash2 contexts (reference src/lz.rs:481-492)
static inline int hash1(const uint8_t* buf, int64_t pos) {
  return (buf[pos] & 0x7f) | (int(is_alnum(buf[pos - 1])) << 7);
}
static inline int hash2(const uint8_t* buf, int64_t pos) {
  return (buf[pos] & 0x7f) | (hash1(buf, pos - 1) << 7);
}

// 4-byte rolling hash (reference src/matcher.rs:255-263)
static inline uint32_t hash_dword(const uint8_t* buf, int64_t pos) {
  static const uint32_t MULS[4] = {131313131u, 1313131u, 13131u, 131u};
  static const uint32_t ADDS[4] = {797u, 79797u, 7979797u, 797979797u};
  uint32_t h = 0;
  for (int k = 0; k < 4; k++) h += (uint32_t(buf[pos + k]) * MULS[k]) ^ ADDS[k];
  return h;
}

// first mismatch position, up to max_len (reference src/mem.rs:41-51)
static inline int common_prefix(const uint8_t* buf, int64_t p1, int64_t p2, int max_len) {
  for (int l = 0; l < max_len; l += 8) {
    uint64_t a, b;
    std::memcpy(&a, buf + p1 + l, 8);
    std::memcpy(&b, buf + p2 + l, 8);
    uint64_t x = a ^ b;
    if (x) return l + (__builtin_ctzll(x) >> 3);
  }
  return max_len;
}

static inline bool bytes_equal(const uint8_t* buf, int64_t p1, int64_t p2, int len) {
  // exact equality over len bytes (reference src/mem.rs:55-70 semantics)
  if (load_u32(buf + p1 + len - 4) != load_u32(buf + p2 + len - 4)) return false;
  return std::memcmp(buf + p1, buf + p2, size_t(len)) == 0;
}

// ---------------------------------------------------------------------------
// ROID tables (reference src/lz.rs:494-534)
// ---------------------------------------------------------------------------

struct RoidEnc {
  uint8_t roid, robitlen;
  uint16_t robits;
};
static RoidEnc ROID_ENC[RING];
static uint16_t ROID_DEC_BASE[LZ_ROID_SIZE];
static uint8_t ROID_DEC_BITLEN[LZ_ROID_SIZE];

static struct RoidInit {
  RoidInit() {
    int base = 0, id = 0;
    while (base < RING) {
      int bitlen = id / 2;
      ROID_DEC_BASE[id] = uint16_t(base);
      ROID_DEC_BITLEN[id] = uint8_t(bitlen);
      for (int rest = 0; rest < (1 << bitlen) && base < RING; rest++) {
        ROID_ENC[base] = {uint8_t(id), uint8_t(bitlen), uint16_t(rest)};
        base++;
      }
      id++;
    }
  }
} roid_init_;

// ---------------------------------------------------------------------------
// Bit coder (reference src/coder.rs)
// ---------------------------------------------------------------------------

struct BitEncoder {
  uint8_t* out;
  int64_t pos = 0;
  uint64_t val = 0;
  int len = 0;

  explicit BitEncoder(uint8_t* o) : out(o) {}

  inline void reserve32() {
    if (len >= 32) {
      len -= 32;
      uint32_t w = uint32_t(val >> len);
      w = bswap32(w);  // big-endian words
      std::memcpy(out + pos, &w, 4);
      pos += 4;
      val &= (uint64_t(1) << len) - 1;
    }
  }
  inline void put(int nbits, uint64_t bits) {
    val = (val << nbits) | (bits & ((uint64_t(1) << nbits) - 1));
    len += nbits;
  }
  inline void raw(uint32_t bits, int nbits) {
    reserve32();
    put(nbits, bits);
  }
  void varint(uint32_t v) {
    for (;;) {
      reserve32();
      bool has_next = v > 1;
      put(2, (v & 1) | (uint64_t(has_next) << 1));
      v >>= 1;
      if (!has_next) break;
    }
  }
  int64_t finish() {
    reserve32();
    if (len > 0) {
      put(32 - len, 0);
      while (len > 0) {
        out[pos++] = uint8_t(val >> (len - 8));
        len -= std::min(8, len);
      }
      val = 0;
    }
    return pos;
  }
};

struct BitDecoder {
  const uint8_t* inp;
  int64_t pos = 0;
  uint64_t val = 0;
  int len = 0;
  int64_t limit;  // physical safe read bound (payload is 0-padded past this by caller contract)

  BitDecoder(const uint8_t* i, int64_t n) : inp(i), limit(n) {}

  inline void reserve32() {
    if (len < 32) {
      uint32_t w = 0;
      if (pos + 4 <= limit) {
        std::memcpy(&w, inp + pos, 4);
      } else {
        for (int k = 0; k < 4 && pos + k < limit; k++) ((uint8_t*)&w)[k] = inp[pos + k];
      }
      val = (val << 32) | bswap32(w);
      len += 32;
      pos += 4;
    }
  }
  inline uint64_t peek(int nbits) { return (val >> (len - nbits)) & ((uint64_t(1) << nbits) - 1); }
  inline void skip(int nbits) { len -= nbits; }
  inline uint32_t raw(int nbits) {
    reserve32();
    uint32_t v = uint32_t(peek(nbits));
    skip(nbits);
    return v;
  }
  uint32_t varint() {
    uint32_t v = 0;
    for (int shift = 0;; shift++) {
      reserve32();
      uint32_t bits = uint32_t(peek(2));
      skip(2);
      v |= (bits & 1) << shift;
      if (bits <= 1) break;
    }
    return v;
  }
};

// ---------------------------------------------------------------------------
// Huffman (reference src/huffman.rs)
// ---------------------------------------------------------------------------

// Build canonical code lengths; min-heap ordered by (weight, node index).
static void huff_build_code_lens(const uint32_t* weights, int n, int max_code_len, uint8_t* code_lens) {
  std::vector<uint32_t> w(weights, weights + n);
  typedef std::pair<uint32_t, uint32_t> HN;  // (weight, index)
  for (;;) {
    std::priority_queue<HN, std::vector<HN>, std::greater<HN>> heap;
    for (int i = 0; i < n; i++)
      if (weights[i] > 0) heap.push({w[i], uint32_t(i)});
    if (heap.size() <= 1) {
      std::memset(code_lens, 0, size_t(n));
      if (!heap.empty()) code_lens[heap.top().second] = 1;
      return;
    }
    std::vector<std::pair<uint32_t, uint32_t>> children;  // for nodes >= n
    children.reserve(size_t(n));
    while (heap.size() > 1) {
      HN n1 = heap.top();
      heap.pop();
      HN n2 = heap.top();
      heap.pop();
      uint32_t idx = uint32_t(n) + uint32_t(children.size());
      children.push_back({n1.second, n2.second});
      heap.push({n1.first + n2.first, idx});
    }
    std::vector<uint8_t> lens(size_t(n) + children.size(), 0);
    for (int i = int(lens.size()) - 1; i >= n; i--) {
      lens[children[size_t(i - n)].first] = uint8_t(lens[size_t(i)] + 1);
      lens[children[size_t(i - n)].second] = uint8_t(lens[size_t(i)] + 1);
    }
    int cur_max = 0;
    for (int i = 0; i < n; i++) cur_max = std::max(cur_max, int(lens[size_t(i)]));
    if (cur_max > max_code_len) {
      uint32_t shrink = uint32_t(1) << (cur_max - max_code_len);
      for (int i = 0; i < n; i++)
        if (w[i] > 0) w[i] = std::max(w[i] / shrink, 1u);
      continue;
    }
    std::memcpy(code_lens, lens.data(), size_t(n));
    return;
  }
}

// canonical code assignment (reference src/huffman.rs:118-141)
static void huff_encodings(const uint8_t* code_lens, int n, uint16_t* codes, uint16_t* lens_out) {
  std::vector<uint16_t> ordered;
  ordered.reserve(size_t(n));
  for (int i = 0; i < n; i++)
    if (code_lens[i] > 0) ordered.push_back(uint16_t(i));
  std::sort(ordered.begin(), ordered.end(), [&](uint16_t a, uint16_t b) {
    return code_lens[a] != code_lens[b] ? code_lens[a] < code_lens[b] : a < b;
  });
  std::memset(codes, 0, sizeof(uint16_t) * size_t(n));
  std::memset(lens_out, 0, sizeof(uint16_t) * size_t(n));
  uint16_t bits = 0;
  int cur_len = 1;
  for (uint16_t sym : ordered) {
    int shift = int(code_lens[sym]) - cur_len;
    if (shift > 0) {
      bits = uint16_t(bits << shift);
      cur_len += shift;
    }
    codes[sym] = bits;
    lens_out[sym] = code_lens[sym];
    bits++;
  }
}

struct HuffDecoding {
  std::vector<uint16_t> sym;  // 1 << max_code_len entries
  std::vector<uint8_t> len;
  int max_code_len = 0;

  void build(const uint8_t* code_lens, int n, int mcl) {
    max_code_len = mcl;
    sym.assign(size_t(1) << mcl, 0);
    len.assign(size_t(1) << mcl, 0);
    std::vector<uint16_t> codes(static_cast<size_t>(n));
    std::vector<uint16_t> lens(static_cast<size_t>(n));
    huff_encodings(code_lens, n, codes.data(), lens.data());
    size_t cap = size_t(1) << mcl;
    for (int s = 0; s < n; s++) {
      if (lens[size_t(s)] > 0) {
        int rest = mcl - lens[size_t(s)];
        if (rest < 0) continue;
        size_t base = size_t(codes[size_t(s)]) << rest;
        size_t span = size_t(1) << rest;
        if (base + span > cap) continue;  // corrupt table: Kraft overflow
        for (size_t k = 0; k < span; k++) {
          sym[base + k] = uint16_t(s);
          len[base + k] = uint8_t(lens[size_t(s)]);
        }
      }
    }
  }
};

static void encode_huff_table(BitEncoder& enc, const uint8_t* code_lens, int n) {
  int max_code_len = 0;
  for (int i = 0; i < n; i++) max_code_len = std::max(max_code_len, int(code_lens[i]));
  enc.varint(uint32_t(max_code_len));
  int last_sym = -1;
  for (int s = 0; s < n; s++) {
    if (code_lens[s] > 0) {
      enc.varint(uint32_t(last_sym < 0 ? s + 1 : s - last_sym));
      enc.varint(uint32_t(max_code_len - code_lens[s]));
      last_sym = s;
    }
  }
  enc.varint(0);
}

// returns max_code_len; fills code_lens[0..n) (missing tail = 0)
static int decode_huff_table(BitDecoder& dec, uint8_t* code_lens, int n) {
  int max_code_len = int(dec.varint());
  if (max_code_len < 0 || max_code_len > 15) return -1;  // before any LUT sizing
  std::memset(code_lens, 0, size_t(n));
  int s = -1;
  for (;;) {
    uint32_t delta = dec.varint();
    if (delta == 0) break;
    s = (s < 0 ? int(delta) - 1 : s + int(delta));
    if (s < 0 || s >= n) return -1;
    int cl = max_code_len - int(dec.varint());
    if (cl < 0) return -1;
    code_lens[s] = uint8_t(cl);
  }
  return max_code_len;
}

// ---------------------------------------------------------------------------
// Symbol-ranking transform (reference src/symrank.rs)
// ---------------------------------------------------------------------------

struct SymRank {
  uint16_t value_array[NUM_SR_CONTEXTS][NUM_SYMBOLS];
  uint16_t index_array[NUM_SR_CONTEXTS][NUM_SYMBOLS];
  uint32_t cnt[NUM_SR_CONTEXTS];
  uint32_t idx_sum[NUM_SR_CONTEXTS];

  void init_all(const uint16_t* vs) {
    for (int i = 0; i < NUM_SYMBOLS; i++) {
      value_array[0][i] = vs[i];
      index_array[0][vs[i]] = uint16_t(i);
    }
    for (int c = 1; c < NUM_SR_CONTEXTS; c++) {
      std::memcpy(value_array[c], value_array[0], sizeof(value_array[0]));
      std::memcpy(index_array[c], index_array[0], sizeof(index_array[0]));
    }
    for (int c = 0; c < NUM_SR_CONTEXTS; c++) {
      cnt[c] = 0;
      idx_sum[c] = 1000000;
    }
  }

  inline void update(int c, uint16_t v, uint16_t i) {
    if (cnt[c] > uint32_t(NUM_SYMBOLS)) {
      cnt[c] = cnt[c] * 9 / 10;
      idx_sum[c] = idx_sum[c] * 9 / 10;
    }
    cnt[c] += 1;
    idx_sum[c] += i;
    uint16_t step = uint16_t(i / 16 + uint16_t(idx_sum[c] / 16 / cnt[c]));
    uint16_t next_i = std::max(uint16_t(step <= i ? i - step : 0), uint16_t(i / 2));
    uint16_t* va = value_array[c];
    uint16_t* ia = index_array[c];
    uint16_t d = uint16_t(i - next_i);
    if (d == 0) return;
    if (d == 1) {
      uint16_t nv1 = va[next_i];
      ia[v] = next_i;
      va[i] = nv1;
      ia[nv1] = i;
      va[next_i] = v;
    } else {
      uint16_t ni2 = next_i;
      uint16_t ni1 = uint16_t(next_i + d / 2);
      uint16_t nv1 = va[ni1];
      uint16_t nv2 = va[ni2];
      va[i] = nv1;
      ia[nv1] = i;
      va[ni1] = nv2;
      ia[nv2] = ni1;
      va[ni2] = v;
      ia[v] = ni2;
    }
  }

  inline uint16_t encode(int c, uint16_t v, uint16_t vunlikely) {
    uint16_t i = index_array[c][v];
    uint16_t iu = index_array[c][vunlikely];
    update(c, v, i);
    if (i == iu) return uint16_t(NUM_SYMBOLS - 1);
    return uint16_t(i - (i > iu ? 1 : 0));
  }

  inline uint16_t decode(int c, uint16_t i, uint16_t vunlikely) {
    uint16_t iu = index_array[c][vunlikely];
    if (i == uint16_t(NUM_SYMBOLS - 1))
      i = iu;
    else
      i = uint16_t(i + (i < iu ? 0 : 1));
    uint16_t v = value_array[c][i];
    update(c, v, i);
    return v;
  }
};

// ---------------------------------------------------------------------------
// ROLZ buckets + hash chains (reference src/matcher.rs)
// ---------------------------------------------------------------------------

struct Buckets {
  // ring per context
  uint32_t pos[NUM_BUCKETS][RING];
  uint8_t len_min[NUM_BUCKETS][RING];
  uint8_t expected[NUM_BUCKETS][RING];
  int32_t head[NUM_BUCKETS];

  void init() { std::memset(this, 0, sizeof(*this)); }

  inline void update(int c, uint32_t p, int reduced_offset, int match_len) {
    int h = head[c];
    int new_head = h + 1 == RING ? 0 : h + 1;
    if (match_len >= LZ_MATCH_MIN_LEN) {
      int node = h - reduced_offset;
      if (node < 0) node += RING;
      if (int(len_min[c][node]) <= match_len) len_min[c][node] = uint8_t(std::min(match_len + 1, 127));
    }
    pos[c][new_head] = p;
    len_min[c][new_head] = 0;
    expected[c][new_head] = uint8_t(match_len);
    head[c] = new_head;
  }

  void forward(int64_t n) {
    for (int c = 0; c < NUM_BUCKETS; c++)
      for (int i = 0; i < RING; i++) pos[c][i] = pos[c][i] > uint32_t(n) ? pos[c][i] - uint32_t(n) : 0;
  }
};

struct Chains {
  int16_t heads[NUM_BUCKETS][HASHN];
  int16_t nexts[NUM_BUCKETS][RING];

  void init() { std::memset(this, -1, sizeof(*this)); }

  inline void update(const Buckets& b, int c, const uint8_t* buf, int64_t p) {
    int entry = int(hash_dword(buf, p) % uint32_t(HASHN));
    int h = b.head[c];
    nexts[c][h] = heads[c][entry];
    heads[c][entry] = int16_t(h);
  }

  void forward(const Buckets& b) {
    for (int c = 0; c < NUM_BUCKETS; c++) {
      for (int e = 0; e < HASHN; e++)
        if (heads[c][e] != -1 && b.pos[c][heads[c][e]] == 0) heads[c][e] = -1;
      for (int i = 0; i < RING; i++)
        if (nexts[c][i] != -1 && b.pos[c][nexts[c][i]] == 0) nexts[c][i] = -1;
    }
  }
};

struct MatchResult {
  int reduced_offset = 0;
  int match_len = 0;
  int match_len_expected = 0;
  int match_len_min = 0;
};

// reference src/matcher.rs:135-192
static MatchResult find_match(const Buckets& b, const Chains& ch, int c, const uint8_t* buf, int64_t buf_len,
                              int64_t pos, int depth) {
  MatchResult r;
  int entry = int(hash_dword(buf, pos) % uint32_t(HASHN));
  int node = ch.heads[c][entry];
  if (node < 0) return r;
  int max_len = LZ_MATCH_MIN_LEN - 1;
  int mlm = LZ_MATCH_MIN_LEN, mle = LZ_MATCH_MIN_LEN;
  int max_node = 0;
  int64_t node_pos = b.pos[c][node];
  uint32_t max_len_dword = load_u32(buf + pos + max_len - 3);

  for (int d = 0; d < depth; d++) {
    if (load_u32(buf + node_pos + max_len - 3) == max_len_dword) {
      int lcp = common_prefix(buf, node_pos, pos, LZ_MATCH_MAX_LEN);
      if (lcp > max_len) {
        mlm = b.len_min[c][node];
        mle = b.expected[c][node];
        max_len = lcp;
        max_node = node;
        max_len_dword = load_u32(buf + pos + max_len - 3);
      }
      if (lcp == LZ_MATCH_MAX_LEN) break;
      if (mle > 0 && lcp > mle) break;
    }
    node = ch.nexts[c][node];
    if (node < 0) break;
    int64_t node_pos_next = b.pos[c][node];
    if (node_pos <= node_pos_next) break;
    node_pos = node_pos_next;
  }

  if (max_len >= LZ_MATCH_MIN_LEN && pos + max_len < buf_len) {
    int ro = b.head[c] - max_node;
    if (ro < 0) ro += RING;
    r.reduced_offset = ro;
    r.match_len = max_len;
    r.match_len_expected = std::max(mle, LZ_MATCH_MIN_LEN);
    r.match_len_min = std::max(mlm, LZ_MATCH_MIN_LEN);
  }
  return r;
}

// reference src/matcher.rs:194-228
static bool has_lazy_match(const Buckets& b, const Chains& ch, int c, const uint8_t* buf, int64_t pos,
                           int min_match_len, int depth) {
  int entry = int(hash_dword(buf, pos) % uint32_t(HASHN));
  int node = ch.heads[c][entry];
  if (node < 0) return false;
  int64_t node_pos = b.pos[c][node];
  for (int d = 0; d < depth; d++) {
    if (bytes_equal(buf, node_pos, pos, min_match_len)) return true;
    node = ch.nexts[c][node];
    if (node < 0) break;
    int64_t node_pos_next = b.pos[c][node];
    if (node_pos <= node_pos_next) break;
    node_pos = node_pos_next;
  }
  return false;
}

// ---------------------------------------------------------------------------
// LZ codec core (reference src/lz.rs)
// ---------------------------------------------------------------------------

struct Item {
  uint16_t symbol;
  uint16_t sr_ctx;
  uint16_t robits;
  uint8_t sr_unlikely;
  uint8_t flags;  // bit0: after_literal, bit1: is_match
  uint8_t robitlen;
  uint8_t encoded_match_len;
};

struct LZContext {
  Buckets buckets;
  SymRank symrank;
  uint16_t words[WORD_TABLE_SIZE];
  bool first_block;
  bool after_literal;

  void init() {
    buckets.init();
    std::memset(words, 0, sizeof(words));
    first_block = true;
    after_literal = true;
    // symrank contents are initialized by the first-chunk census
    std::memset(&symrank, 0, sizeof(symrank));
    for (int c = 0; c < NUM_SR_CONTEXTS; c++) symrank.idx_sum[c] = 1000000;
  }
};

struct Encoder {
  LZContext ctx;
  Chains chains;
  OrzLZCfg cfg;
  std::vector<Item> items;

  void init(const OrzLZCfg& c) {
    ctx.init();
    chains.init();
    cfg = c;
    items.reserve(LZ_CHUNK_SIZE);
  }
};

struct Decoder {
  LZContext ctx;
  void init() { ctx.init(); }
};

// overlap-safe LZ copy, byte-wise semantics (reference src/mem.rs:74-92)
static inline void lz_copy(uint8_t* buf, int64_t psrc, int64_t pdst, int len) {
  if (pdst - psrc >= 8) {
    for (int l = 0; l < len; l += 8) std::memcpy(buf + pdst + l, buf + psrc + l, 8);
    return;
  }
  for (int l = 0; l < len; l++) buf[pdst + l] = buf[psrc + l];
}

extern "C" {

void* orz_enc_new(const OrzLZCfg* cfg) {
  Encoder* e = new Encoder();
  e->init(*cfg);
  return e;
}
void orz_enc_free(void* h) { delete static_cast<Encoder*>(h); }
void orz_enc_forward(void* h, int64_t n) {
  Encoder* e = static_cast<Encoder*>(h);
  e->ctx.buckets.forward(n);
  e->chains.forward(e->ctx.buckets);
}

void* orz_dec_new() {
  Decoder* d = new Decoder();
  d->init();
  return d;
}
void orz_dec_free(void* h) { delete static_cast<Decoder*>(h); }
void orz_dec_forward(void* h, int64_t n) { static_cast<Decoder*>(h)->ctx.buckets.forward(n); }

// Encode one chunk starting at spos.  sbuf must be physically padded with
// >= 480 readable zero bytes beyond sbuf_len.  Returns new spos; *tlen_out
// receives the payload length.  Returns -1 on output overflow.
int64_t orz_enc_chunk(void* h, const uint8_t* sbuf, int64_t sbuf_len, int64_t spos, uint8_t* tbuf,
                      int64_t tcap, int64_t* tlen_out) {
  Encoder* e = static_cast<Encoder*>(h);
  LZContext& ctx = e->ctx;
  Buckets& bk = ctx.buckets;
  Chains& ch = e->chains;
  const OrzLZCfg& cfg = e->cfg;
  std::vector<Item>& items = e->items;
  items.clear();

  // rough worst-case bound: census + headers + tables + items
  if (tcap < int64_t(LZ_CHUNK_SIZE) * 8 + 65536) return -1;

  BitEncoder enc(tbuf);

  // ---- phase 1: parse (reference src/lz.rs:131-235) ----
  while (spos < sbuf_len && items.size() < size_t(LZ_CHUNK_SIZE)) {
    int c1 = hash1(sbuf, spos - 1);
    uint16_t last_word = ctx.words[hash2(sbuf, spos - 1)];
    bool last_word_matched = load_u16(sbuf + spos) == last_word;
    uint16_t sr_ctx = uint16_t(c1 | (int(ctx.after_literal) << 8));
    uint8_t sr_unlikely = uint8_t(last_word & 0xff);

    int lazy_match_id = 0;
    MatchResult m = find_match(bk, ch, c1, sbuf, sbuf_len, spos, cfg.match_depth);
    if (m.match_len > 0) {
      RoidEnc re = ROID_ENC[m.reduced_offset];

      if (m.match_len < LZ_MATCH_MAX_LEN / 2) {
        int lazy_len1 = m.match_len + 1 + (re.robitlen < 8 ? 1 : 0);
        int lazy_len2 = lazy_len1 - (last_word_matched ? 1 : 0);
        if (has_lazy_match(bk, ch, hash1(sbuf, spos), sbuf, spos + 1, lazy_len1, cfg.lazy_match_depth1))
          lazy_match_id = 1;
        else if (has_lazy_match(bk, ch, hash1(sbuf, spos + 1), sbuf, spos + 2, lazy_len2,
                                cfg.lazy_match_depth2))
          lazy_match_id = 2;
      }

      if (lazy_match_id == 0) {
        int encoded_match_len;
        if (m.match_len > m.match_len_expected)
          encoded_match_len = m.match_len - m.match_len_min;
        else if (m.match_len < m.match_len_expected)
          encoded_match_len = m.match_len - m.match_len_min + 1;
        else
          encoded_match_len = 0;
        int lenid = std::min(LZ_LENID_SIZE - 1, encoded_match_len);
        Item it;
        it.symbol = uint16_t(256 + int(re.roid) * LZ_LENID_SIZE + lenid);
        it.sr_ctx = sr_ctx;
        it.sr_unlikely = sr_unlikely;
        it.flags = uint8_t(int(ctx.after_literal) | 2);
        it.robitlen = re.robitlen;
        it.robits = re.robits;
        it.encoded_match_len = uint8_t(encoded_match_len);
        items.push_back(it);

        bk.update(c1, uint32_t(spos), m.reduced_offset, m.match_len);
        ch.update(bk, c1, sbuf, spos);
        spos += m.match_len;
        ctx.after_literal = false;
        ctx.words[hash2(sbuf, spos - 3)] = load_u16(sbuf + spos - 2);
        continue;
      }
    }
    bk.update(c1, uint32_t(spos), 0, 0);
    ch.update(bk, c1, sbuf, spos);

    if (spos + 1 < sbuf_len && lazy_match_id != 1 && last_word_matched) {
      Item it{uint16_t(WORD_SYMBOL), sr_ctx, 0, sr_unlikely, uint8_t(ctx.after_literal), 0, 0};
      items.push_back(it);
      spos += 2;
      ctx.after_literal = false;
    } else {
      Item it{uint16_t(sbuf[spos]), sr_ctx, 0, sr_unlikely, uint8_t(ctx.after_literal), 0, 0};
      items.push_back(it);
      spos += 1;
      ctx.after_literal = true;
      ctx.words[hash2(sbuf, spos - 3)] = load_u16(sbuf + spos - 2);
    }
  }

  // ---- first chunk: symbol census (reference src/lz.rs:238-265) ----
  if (ctx.first_block) {
    uint32_t counts[NUM_SYMBOLS] = {0};
    for (const Item& it : items) counts[it.symbol]++;
    int num_counted = 0;
    for (int s = 0; s < NUM_SYMBOLS; s++)
      if (counts[s] > 1) num_counted++;
    uint16_t vs[NUM_SYMBOLS];
    for (int s = 0; s < NUM_SYMBOLS; s++) vs[s] = uint16_t(s);
    std::stable_sort(vs, vs + NUM_SYMBOLS, [&](uint16_t a, uint16_t b) {
      return std::max(counts[a], 1u) > std::max(counts[b], 1u);
    });
    enc.varint(uint32_t(num_counted));
    for (int i = 0; i < num_counted; i++) enc.raw(vs[i], 9);
    ctx.symrank.init_all(vs);
    ctx.first_block = false;
  }

  enc.varint(uint32_t(std::min(spos, sbuf_len)));
  enc.varint(uint32_t(items.size()));

  // ---- phase 2: symrank transform + weight census (reference src/lz.rs:272-305) ----
  uint32_t w1[2][NUM_SYMBOLS] = {{0}};
  uint32_t w2[LZ_MATCH_MAX_LEN] = {0};
  for (Item& it : items) {
    uint16_t es = ctx.symrank.encode(it.sr_ctx, it.symbol, it.sr_unlikely);
    w1[it.flags & 1][es]++;
    if ((it.flags & 2) && it.encoded_match_len >= LZ_LENID_SIZE - 1) w2[it.encoded_match_len]++;
    it.symbol = es;
  }

  // ---- phase 3: huffman tables ----
  uint8_t lens1[2][NUM_SYMBOLS], lens2[LZ_MATCH_MAX_LEN];
  huff_build_code_lens(w1[0], NUM_SYMBOLS, MAX_CODE_LEN, lens1[0]);
  huff_build_code_lens(w1[1], NUM_SYMBOLS, MAX_CODE_LEN, lens1[1]);
  huff_build_code_lens(w2, LZ_MATCH_MAX_LEN, MAX_CODE_LEN, lens2);
  encode_huff_table(enc, lens1[0], NUM_SYMBOLS);
  encode_huff_table(enc, lens1[1], NUM_SYMBOLS);
  encode_huff_table(enc, lens2, LZ_MATCH_MAX_LEN);
  uint16_t codes1[2][NUM_SYMBOLS], clens1[2][NUM_SYMBOLS];
  uint16_t codes2[LZ_MATCH_MAX_LEN], clens2[LZ_MATCH_MAX_LEN];
  huff_encodings(lens1[0], NUM_SYMBOLS, codes1[0], clens1[0]);
  huff_encodings(lens1[1], NUM_SYMBOLS, codes1[1], clens1[1]);
  huff_encodings(lens2, LZ_MATCH_MAX_LEN, codes2, clens2);

  // ---- phase 4: bit-pack (reference src/lz.rs:320-344) ----
  for (const Item& it : items) {
    int al = it.flags & 1;
    enc.reserve32();
    enc.put(clens1[al][it.symbol], codes1[al][it.symbol]);
    if (it.flags & 2) {
      enc.raw(it.robits, it.robitlen);
      if (it.encoded_match_len >= LZ_LENID_SIZE - 1) {
        enc.reserve32();
        enc.put(clens2[it.encoded_match_len], codes2[it.encoded_match_len]);
      }
    }
  }

  *tlen_out = enc.finish();
  return spos;
}

// Decode one chunk payload into sbuf starting at spos.  Returns the new spos,
// or a negative error code.
int64_t orz_dec_chunk(void* h, const uint8_t* tbuf, int64_t t, uint8_t* sbuf, int64_t sbuf_cap,
                      int64_t spos) {
  Decoder* d = static_cast<Decoder*>(h);
  LZContext& ctx = d->ctx;
  Buckets& bk = ctx.buckets;
  BitDecoder dec(tbuf, t);

  if (ctx.first_block) {
    uint32_t num_counted = dec.varint();
    if (num_counted > uint32_t(NUM_SYMBOLS)) return -2;
    uint16_t vs[NUM_SYMBOLS];
    bool seen[NUM_SYMBOLS] = {false};
    uint32_t k = 0;
    for (; k < num_counted; k++) {
      uint32_t s = dec.raw(9);
      if (s >= uint32_t(NUM_SYMBOLS)) return -2;
      vs[k] = uint16_t(s);
      seen[s] = true;
    }
    for (int s = 0; s < NUM_SYMBOLS; s++)
      if (!seen[s]) {
        if (k >= uint32_t(NUM_SYMBOLS)) return -2;
        vs[k++] = uint16_t(s);
      }
    if (k != uint32_t(NUM_SYMBOLS)) return -2;
    ctx.symrank.init_all(vs);
    ctx.first_block = false;
  }

  int64_t sbuf_len = dec.varint();
  int64_t n_items = dec.varint();
  if (sbuf_len > sbuf_cap || n_items > int64_t(LZ_CHUNK_SIZE)) return -2;

  HuffDecoding huff1[2], huff2;
  {
    uint8_t lens[NUM_SYMBOLS];
    int mcl = decode_huff_table(dec, lens, NUM_SYMBOLS);
    if (mcl < 0) return -2;
    huff1[0].build(lens, NUM_SYMBOLS, mcl);
    mcl = decode_huff_table(dec, lens, NUM_SYMBOLS);
    if (mcl < 0) return -2;
    huff1[1].build(lens, NUM_SYMBOLS, mcl);
    uint8_t lens2[LZ_MATCH_MAX_LEN];
    mcl = decode_huff_table(dec, lens2, LZ_MATCH_MAX_LEN);
    if (mcl < 0) return -2;
    huff2.build(lens2, LZ_MATCH_MAX_LEN, mcl);
  }

  for (int64_t n = 0; n < n_items; n++) {
    HuffDecoding& hd = huff1[ctx.after_literal ? 1 : 0];
    dec.reserve32();
    uint32_t peeked = hd.max_code_len ? uint32_t(dec.peek(hd.max_code_len)) : 0;
    uint16_t symbol = hd.sym[peeked];
    dec.skip(hd.len[peeked]);
    // strict bound (the reference's lenient 0..=389 check, src/lz.rs:413-415,
    // would let symbol 389 index past the symrank tables on corrupt input)
    if (symbol >= uint16_t(NUM_SYMBOLS)) return -2;

    int c1 = hash1(sbuf, spos - 1);
    uint16_t last_word = ctx.words[hash2(sbuf, spos - 1)];
    int sr_ctx = c1 | (int(ctx.after_literal) << 8);
    uint16_t v = ctx.symrank.decode(sr_ctx, symbol, uint16_t(last_word & 0xff));

    if (v == uint16_t(WORD_SYMBOL)) {
      bk.update(c1, uint32_t(spos), 0, 0);
      ctx.after_literal = false;
      if (spos + 2 > sbuf_cap) return -3;
      sbuf[spos] = uint8_t(last_word & 0xff);
      sbuf[spos + 1] = uint8_t(last_word >> 8);
      spos += 2;
    } else if (v <= 255) {
      bk.update(c1, uint32_t(spos), 0, 0);
      ctx.after_literal = true;
      if (spos + 1 > sbuf_cap) return -3;
      sbuf[spos] = uint8_t(v);
      spos += 1;
      ctx.words[hash2(sbuf, spos - 3)] = load_u16(sbuf + spos - 2);
    } else {
      int roid = (v - 256) / LZ_LENID_SIZE;
      int lenid = (v - 256) % LZ_LENID_SIZE;
      int reduced_offset = int(ROID_DEC_BASE[roid]) + int(dec.raw(ROID_DEC_BITLEN[roid]));
      int node = bk.head[c1] - reduced_offset;
      if (node < 0) node += RING;
      int64_t match_pos = bk.pos[c1][node];
      int match_len_min = std::max(int(bk.len_min[c1][node]), LZ_MATCH_MIN_LEN);
      int match_len_expected = std::max(int(bk.expected[c1][node]), LZ_MATCH_MIN_LEN);

      int encoded_match_len;
      if (lenid == LZ_LENID_SIZE - 1) {
        dec.reserve32();
        uint32_t p2 = huff2.max_code_len ? uint32_t(dec.peek(huff2.max_code_len)) : 0;
        encoded_match_len = huff2.sym[p2];
        dec.skip(huff2.len[p2]);
      } else {
        encoded_match_len = lenid;
      }

      int match_len;
      if (encoded_match_len + match_len_min > match_len_expected)
        match_len = encoded_match_len + match_len_min;
      else if (encoded_match_len > 0)
        match_len = encoded_match_len + match_len_min - 1;
      else
        match_len = match_len_expected;

      bk.update(c1, uint32_t(spos), reduced_offset, match_len);
      ctx.after_literal = false;
      if (spos + match_len > sbuf_cap || match_pos >= spos || match_pos + match_len > sbuf_cap)
        return -3;
      lz_copy(sbuf, match_pos, spos, match_len);
      spos += match_len;
      ctx.words[hash2(sbuf, spos - 3)] = load_u16(sbuf + spos - 2);
    }
  }
  return std::min(spos, sbuf_len);
}

}  // extern "C"
