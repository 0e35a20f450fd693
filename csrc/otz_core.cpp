// Native OTZ segment decoder.
//
// OTZ encode runs on the TPU (orz_tpu/device/pipeline.py); decode is
// inherently sequential per segment (symbol boundaries and model state feed
// back per item), so the fast decode path is this C++ routine, parallelized
// ACROSS segments by the container layer.  Semantics mirror the format
// specification in orz_tpu/device/refcodec.py (decode_segment_ref) exactly;
// the modeling stack matches the reference design (symbol ranking:
// reference src/symrank.rs; canonical Huffman: reference src/huffman.rs;
// MSB-first bit stream: reference src/coder.rs:159-216).
//
// Exported C ABI (ctypes):
//   otz_raw_len(src, len) -> int64              (peek decompressed size)
//   otz_decode_segment(src, len, dst, cap) -> int64 bytes written or <0

#include <cstdint>
#include <cstring>
#include <vector>

// OTZ_PROF: section cycle counters (rdtsc) for the decode hot loop, read
// back via otz_prof_read().  Adds ~5 rdtsc probes per item — meaningful for
// SHARE analysis only, not absolute rates.  Off in the shipped build.
#ifdef OTZ_PROF
#include <x86intrin.h>
static uint64_t g_prof[8];
struct ProfScope {
  int slot;
  uint64_t t0;
  ProfScope(int s) : slot(s), t0(__rdtsc()) {}
  ~ProfScope() { g_prof[slot] += __rdtsc() - t0; }
};
#define PROF(slot) ProfScope _prof##__LINE__(slot)
#else
#define PROF(slot)
#endif

namespace {

constexpr int PAD_FRONT = 16;
constexpr int PAD_TAIL = 240 + 32;
constexpr int NUM_CONTEXTS = 256;
constexpr int RING = 32766;
constexpr int ROID_SIZE = 28;  // reference schedule extended to 32766 offsets
constexpr int N_SYM = 431;
constexpr int WORD_SYMBOL = 430;
constexpr int REP0_BASE = 424;  // 424..429: rep0 match, lenid 0..5
constexpr int LENID_SIZE = 6;
constexpr int MATCH_MIN_LEN = 4;
constexpr int FENCE = 4096;  // parse fence (device/spec.py): caps len_min
constexpr int MATCH_MAX_LEN = 240;
constexpr int TABC_SIZE = 256;  // table C: 240 lengths + 16 negative-band slots
constexpr int NEG_EML_BASE = 240;  // eml >= this: length below len_min (spec.py)
constexpr int WORD_TABLE_SIZE = 1 << 15;
constexpr int NCTX_SR = 512;

struct BitDec {
  const uint8_t* p;
  int64_t len;
  int64_t pos = 0;
  uint64_t val = 0;
  int nbits = 0;
  bool fail = false;

  void reserve32() {
    if (nbits < 32) {
      uint32_t w;
      if (pos + 4 <= len) {  // fast path: unaligned big-endian load
        memcpy(&w, p + pos, 4);
        w = __builtin_bswap32(w);
      } else {
        w = 0;
        for (int k = 0; k < 4; k++) {
          uint8_t b = (pos + k < len) ? p[pos + k] : 0;  // zero slack
          w = (w << 8) | b;
        }
      }
      pos += 4;
      val = (val << 32) | w;
      nbits += 32;
    }
  }
  uint32_t peek(int n) { return n ? (uint32_t)((val >> (nbits - n)) & ((1u << n) - 1)) : 0; }
  void skip(int n) { nbits -= n; }
  uint32_t raw(int n) {
    reserve32();
    uint32_t v = peek(n);
    skip(n);
    return v;
  }
  uint64_t varint() {
    uint64_t v = 0;
    int shift = 0;
    while (true) {
      reserve32();
      uint32_t bits = peek(2);
      skip(2);
      v |= (uint64_t)(bits & 1) << shift;
      shift++;
      if (bits <= 1) break;
      if (shift > 62) { fail = true; break; }
    }
    return v;
  }
};

// flat-LUT canonical Huffman decoding (reference src/huffman.rs:144-168).
// One packed uint16 per LUT slot (sym in bits 0..8, code len in bits 12..15):
// halves the table footprint vs separate sym/len arrays — three live tables
// at max_code_len 15 are 3 x 64 KiB, which matters for L2 residency.
struct HuffDec {
  std::vector<uint16_t> lut;
  int max_code_len = 0;

  bool build(BitDec& bd, int nsym_max) {
    int lens[N_SYM];
    for (int i = 0; i < nsym_max; i++) lens[i] = 0;
    max_code_len = (int)bd.varint();
    if (max_code_len < 0 || max_code_len > 15) return false;
    int last_sym = -1;
    while (true) {
      int64_t delta = (int64_t)bd.varint();
      if (bd.fail) return false;
      if (delta == 0) break;
      int sym = (last_sym < 0) ? (int)delta - 1 : last_sym + (int)delta;
      if (sym < 0 || sym >= nsym_max) return false;
      int64_t sub = (int64_t)bd.varint();
      if (sub < 0 || sub > max_code_len) return false;
      lens[sym] = max_code_len - (int)sub;
      last_sym = sym;
    }
    lut.assign((size_t)1 << max_code_len, 0);
    // canonical order by (len, sym)
    uint32_t code = 0;
    int cur_len = 1;
    uint64_t cap = (uint64_t)1 << max_code_len;
    for (int l = 1; l <= max_code_len; l++) {
      for (int s = 0; s < nsym_max; s++) {
        if (lens[s] != l) continue;
        code <<= (l - cur_len);
        cur_len = l;
        int rest = max_code_len - l;
        uint64_t base = (uint64_t)code << rest;
        uint64_t span = (uint64_t)1 << rest;
        if (base + span > cap) return false;  // corrupt table: Kraft overflow
        uint16_t packed = (uint16_t)(s | (l << 12));
        for (uint64_t k = 0; k < span; k++) lut[base + k] = packed;
        code++;
      }
    }
    return true;
  }
  int decode(BitDec& bd) {
    bd.reserve32();
    if (max_code_len == 0) return lut.empty() ? 0 : (lut[0] & 0x1FF);
    uint16_t e = lut[bd.peek(max_code_len)];
    bd.skip(e >> 12);
    return e & 0x1FF;
  }
};

// symbol-ranking state (reference src/symrank.rs, golden/symrank.py)
struct SymRank {
  std::vector<uint16_t> va, ia;
  std::vector<int32_t> cnt, isum;

  void init(const int* perm) {
    // every slot is overwritten below, so grow-only (no zero fill); the
    // decoder instance persists across segments (thread_local in
    // otz_decode_segment), making re-init the whole per-segment model cost
    size_t n = (size_t)NCTX_SR * N_SYM;
    if (va.size() < n) {
      va.resize(n);
      ia.resize(n);
    }
    cnt.assign(NCTX_SR, 0);
    isum.assign(NCTX_SR, 1000000);
    // build context 0 once, then template-copy: memcpy streams ~4x faster
    // than the scalar permute loop, and this ~0.9 MB of writes per segment
    // is the dominant fixed cost at small (2 MiB) segments
    uint16_t* v0 = va.data();
    uint16_t* x0 = ia.data();
    for (int r = 0; r < N_SYM; r++) {
      v0[r] = (uint16_t)perm[r];
      x0[perm[r]] = (uint16_t)r;
    }
    for (int c = 1; c < NCTX_SR; c++) {
      memcpy(&va[(size_t)c * N_SYM], v0, N_SYM * sizeof(uint16_t));
      memcpy(&ia[(size_t)c * N_SYM], x0, N_SYM * sizeof(uint16_t));
    }
  }
  void update(int ctx, int v, int i) {
    if (cnt[ctx] > N_SYM) {
      cnt[ctx] = cnt[ctx] * 9 / 10;
      isum[ctx] = isum[ctx] * 9 / 10;
    }
    cnt[ctx] += 1;
    isum[ctx] += i;
    int step = i / 16 + ((isum[ctx] / 16 / cnt[ctx]) & 0xFFFF);
    int next_i = i - step;
    if (next_i < 0) next_i = 0;
    if (next_i < i / 2) next_i = i / 2;
    uint16_t* vaC = &va[(size_t)ctx * N_SYM];
    uint16_t* iaC = &ia[(size_t)ctx * N_SYM];
    int d = i - next_i;
    if (d == 0) return;
    if (d == 1) {
      uint16_t nv1 = vaC[next_i];
      iaC[v] = (uint16_t)next_i;
      vaC[i] = nv1;
      iaC[nv1] = (uint16_t)i;
      vaC[next_i] = (uint16_t)v;
    } else {
      int ni2 = next_i;
      int ni1 = next_i + d / 2;
      uint16_t nv1 = vaC[ni1];
      uint16_t nv2 = vaC[ni2];
      vaC[i] = nv1;
      iaC[nv1] = (uint16_t)i;
      vaC[ni1] = nv2;
      iaC[nv2] = (uint16_t)ni1;
      vaC[ni2] = (uint16_t)v;
      iaC[v] = (uint16_t)ni2;
    }
  }
  int decode(int ctx, int i, int vunlikely) {
    uint16_t* iaC = &ia[(size_t)ctx * N_SYM];
    int iu = iaC[vunlikely];
    if (i == N_SYM - 1) i = iu;
    else i = i + (i < iu ? 0 : 1);
    int v = va[(size_t)ctx * N_SYM + i];
    update(ctx, v, i);
    return v;
  }
};

// ROID schedule (shared with ORZ, reference src/lz.rs:494-534)
struct Roid {
  int base[ROID_SIZE];
  int bits[ROID_SIZE];
  Roid() {
    int b = 0, id = 0;
    while (b < RING) {
      int bl = id / 2;
      base[id] = b;
      bits[id] = bl;
      for (int rest = 0; rest < (1 << bl) && b < RING; rest++) b++;
      id++;
    }
  }
};
const Roid ROID;

inline int alnum(uint8_t b) {
  return (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z');
}

// cctx(prev1, prev2) as one 64K-entry table lookup: the per-byte ring/word
// catch-up loops run once per INPUT BYTE, and the table load replaces the
// mask/alnum/shift chain on their critical path (~1.5x on the catch-up).
struct Ctx16 {
  uint8_t t[1 << 16];  // index: (prev2 << 8) | prev1
  Ctx16() {
    for (int b2 = 0; b2 < 256; b2++)
      for (int b1 = 0; b1 < 256; b1++)
        t[(b2 << 8) | b1] = (uint8_t)((b1 & 0x7F) | (alnum((uint8_t)b2) << 7));
  }
};
const Ctx16 CTX16;

struct Decoder {
  std::vector<uint8_t> buf;
  // per-context append-only position logs: sequential writes keep the 256
  // active tails cache-resident (a flat (ctx, RING) ring array made every
  // insert a ~60ns DRAM miss and dominated decode time)
  std::vector<int32_t> ring_log[NUM_CONTEXTS];
  // len_min/expected prediction pairs (lazily sized; member so capacity
  // persists across segments like the other buffers)
  std::vector<uint16_t> pred2;
  uint16_t words[WORD_TABLE_SIZE];
  SymRank sr;
  int64_t end = 0, done_ring = PAD_FRONT, done_word = PAD_FRONT;

  inline int cctx_at(int64_t p) const {
    return CTX16.t[(buf[p - 2] << 8) | buf[p - 1]];
  }
  inline int h2_at(int64_t x) const { return (buf[x] & 0x7F) | (cctx_at(x) << 7); }

  int64_t run(const uint8_t* src, int64_t src_len, uint8_t* dst, int64_t cap) {
    BitDec bd{src, src_len};
    int64_t raw_len = (int64_t)bd.varint();
    int64_t chunk_input = (int64_t)bd.varint();
    if (bd.fail) return -1;
    if (raw_len == 0) return 0;
    // sanity bounds before any allocation: a corrupt varint can claim
    // exabytes (vector growth would abort under -fno-exceptions)
    if (raw_len < 0 || raw_len > (int64_t)1 << 33) return -2;
    if (chunk_input <= 0 || raw_len > cap) return -2;

    // grow-only buffer reuse: every byte of [PAD_FRONT, end) is written by
    // an item before any read of it (matches only read q < p; the context
    // hashes read p-1/p-2; the dist>=8 chunked copy's 8-byte over-READ
    // reaches q + match_len + 7 <= p + 7 < end + PAD_TAIL and, because
    // q <= p - 8, never runs ahead of bytes already written — see the
    // copy-site comment), so stale bytes from a previous segment never
    // leak — only the front pad (read by the hashes at p near the start)
    // needs zeroing.  Reusing capacity avoids the per-segment mmap/zero
    // page-fault storm that dominated small-segment decode.
    size_t need = (size_t)(PAD_FRONT + raw_len + PAD_TAIL);
    if (buf.size() < need) buf.resize(need);
    // retention bound (thread_local decoder): one giant segment would pin
    // peak buffers on this pool thread forever; shrink when capacity
    // exceeds 4x the present need
    if (buf.capacity() > 4 * need && buf.capacity() > (4u << 20)) {
      buf.resize(need);
      buf.shrink_to_fit();
      pred2.shrink_to_fit();
    }
    memset(buf.data(), 0, PAD_FRONT);
    end = PAD_FRONT + raw_len;
    done_ring = PAD_FRONT;
    done_word = PAD_FRONT;
    int pred_flag = (int)bd.raw(1);   // length-prediction header bit
    int rings_flag = (int)bd.raw(1);  // 1: item-start rings (spec.py OTZ2)
    int words_flag = (int)bd.raw(1);  // 1: word table sampled at item ends
    // len_min (low byte) and expected (high byte) share one u16 per
    // position: both are indexed by the same random q per match, so one
    // cache line serves the pair (separate arrays cost two misses).
    // assign() must zero the whole range (pred2[p] is read at first touch);
    // on the persistent vector that is a memset, not an allocation
    if (pred_flag) pred2.assign(PAD_FRONT + raw_len, 0);
    size_t est = (size_t)raw_len / 128 + 64;
    for (int c = 0; c < NUM_CONTEXTS; c++) {
      ring_log[c].clear();
      ring_log[c].reserve(est);
    }
    memset(words, 0, sizeof(words));

    int perm[N_SYM];
    bool seen[N_SYM] = {false};
    int64_t num_counted = (int64_t)bd.varint();
    if (num_counted > N_SYM) return -3;
    int np = 0;
    for (int64_t k = 0; k < num_counted; k++) {
      int s = (int)bd.raw(9);
      if (s >= N_SYM || seen[s]) return -3;
      perm[np++] = s;
      seen[s] = true;
    }
    for (int s = 0; s < N_SYM; s++)
      if (!seen[s]) perm[np++] = s;
    sr.init(perm);

    int64_t n_chunks = (raw_len + chunk_input - 1) / chunk_input;
    int64_t p = PAD_FRONT;
    bool after_literal = true;
    int64_t last_dist = 0;  // rep0 state

    for (int64_t c = 0; c < n_chunks; c++) {
      int64_t n_items = (int64_t)bd.varint();
      HuffDec tabA, tabB, tabC;
      if (!tabA.build(bd, N_SYM)) return -4;
      if (!tabB.build(bd, N_SYM)) return -4;
      if (!tabC.build(bd, TABC_SIZE)) return -4;

      HuffDec* tabAB[2] = {&tabB, &tabA};  // indexed by after_literal
      for (int64_t it = 0; it < n_items; it++) {
        if (p >= end || bd.fail) return -5;
        {
          PROF(0);
          while (!words_flag && done_word <= p - 3) {
            int64_t u = done_word;
            words[h2_at(u)] = (uint16_t)(buf[u + 1] | (buf[u + 2] << 8));
            done_word++;
          }
        }

        int64_t p0 = p;  // item start (ring-inserted below if rings_flag)
        int c1 = cctx_at(p);
        int last_word = words[h2_at(p - 1)];
        int sr_ctx = c1 | ((int)after_literal << 8);
        int sym;
        {
          PROF(1);
          sym = tabAB[(int)after_literal]->decode(bd);
        }
        if (sym >= N_SYM) return -6;
        int v;
        {
          PROF(2);
          v = sr.decode(sr_ctx, sym, last_word & 0xFF);
        }

        if (v == WORD_SYMBOL) {
          if (p + 2 > end) return -7;
          buf[p] = (uint8_t)(last_word & 0xFF);
          buf[p + 1] = (uint8_t)(last_word >> 8);
          p += 2;
          after_literal = false;
        } else if (v <= 255) {
          buf[p] = (uint8_t)v;
          p += 1;
          after_literal = true;
        } else {
          PROF(3);
          int lenid;
          int64_t q;
          if (v >= REP0_BASE) {  // rep0: previous match's distance
            lenid = v - REP0_BASE;
            if (last_dist <= 0) return -12;
            q = p - last_dist;
          } else {
            int roid = (v - 256) / LENID_SIZE;
            lenid = (v - 256) % LENID_SIZE;
            if (roid >= ROID_SIZE) return -8;
            int ro = ROID.base[roid] + (int)bd.raw(ROID.bits[roid]);
            // rings_flag=0: every position enters its context ring; =1:
            // only item starts do (inserted at the item's end).  The
            // catch-up runs LAZILY, only when a match actually consults a
            // ring: bursts lengthen from ~3 bytes (per item) to ~20 (per
            // match), amortizing the loop overhead that dominated decode.
            while (!rings_flag && done_ring < p) {
              ring_log[cctx_at(done_ring)].push_back((int32_t)done_ring);
              done_ring++;
            }
            const std::vector<int32_t>& log = ring_log[c1];
            if ((size_t)ro >= log.size() || ro >= RING) return -9;
            q = log[log.size() - 1 - (size_t)ro];
          }
          if (q >= p || q < PAD_FRONT) return -10;
          // overlap the q-side misses (source bytes + prediction pair)
          // with the extension-length huffman decode below
          __builtin_prefetch(&buf[q]);
          if (pred_flag) __builtin_prefetch(&pred2[q], 1);
          int eml = (lenid == LENID_SIZE - 1) ? tabC.decode(bd) : lenid;
          int match_len;
          if (pred_flag) {
            // length prediction (refcodec parse_ref; the reference's
            // len_min/len_expected rule, src/lz.rs:463-467).  The len_min
            // floor is capped by the parse-fence room at p (the encoder
            // truncates matches at FENCE boundaries; see device/spec.py).
            uint16_t pq = pred2[q];
            int lm = pq & 0xFF;
            if (lm < MATCH_MIN_LEN) lm = MATCH_MIN_LEN;
            int room = FENCE - ((p - PAD_FRONT) & (FENCE - 1));
            if (end - p < room) room = end - p;
            if (lm > room) lm = room;
            int ex = pq >> 8;
            if (ex < MATCH_MIN_LEN) ex = MATCH_MIN_LEN;
            if (eml >= NEG_EML_BASE) match_len = lm - 1 - (eml - NEG_EML_BASE);
            else if (eml + lm > ex) match_len = eml + lm;
            else if (eml > 0) match_len = eml + lm - 1;
            else match_len = ex;
            if (match_len < MATCH_MIN_LEN || match_len > MATCH_MAX_LEN) return -13;
            if ((pq & 0xFF) <= match_len)
              pred2[q] = (uint16_t)((pq & 0xFF00) |
                                    (match_len + 1 < 127 ? match_len + 1 : 127));
            uint16_t pp = pred2[p];
            pred2[p] = (uint16_t)((pp & 0x00FF) |
                                  ((match_len < 255 ? match_len : 255) << 8));
          } else {
            match_len = eml + MATCH_MIN_LEN;
          }
          if (p + match_len > end) return -10;
          int64_t dist = p - q;
          if (dist >= 8) {
            // 8-byte chunk copy.  Over-WRITE: up to 7 bytes past
            // p+match_len, absorbed by PAD_TAIL (or overwritten by later
            // items).  Over-READ: the last chunk reads to q+match_len+7;
            // q <= p-8 keeps that strictly below p+match_len < end+PAD_TAIL,
            // i.e. only bytes this segment already wrote (the grow-only
            // buffer's stale-data safety depends on this gate staying
            // dist >= 8 — do not lower it without revisiting both bounds).
            for (int k = 0; k < match_len; k += 8)
              memcpy(&buf[p + k], &buf[q + k], 8);
          } else {
            for (int k = 0; k < match_len; k++) buf[p + k] = buf[q + k];
          }
          last_dist = dist;
          p += match_len;
          after_literal = false;
        }
        if (rings_flag) ring_log[c1].push_back((int32_t)p0);
        if (words_flag && p - p0 != 2) {
          // word table sampled at item ends only (not after word items) —
          // the reference's rule (src/lz.rs:203,233); refcodec words_mode=1
          words[h2_at(p - 3)] = (uint16_t)(buf[p - 2] | (buf[p - 1] << 8));
        }
      }
    }
    if (p != end) return -11;
    memcpy(dst, buf.data() + PAD_FRONT, raw_len);
    return raw_len;
  }
};

}  // namespace

extern "C" {

int64_t otz_raw_len(const uint8_t* src, int64_t src_len) {
  BitDec bd{src, src_len};
  int64_t v = (int64_t)bd.varint();
  return bd.fail ? -1 : v;
}

int64_t otz_decode_segment(const uint8_t* src, int64_t src_len, uint8_t* dst, int64_t cap) {
  // one persistent decoder per pool thread: run() re-initializes all model
  // state but reuses buffer capacity, so steady-state segment decode does
  // no allocation (the per-segment alloc+zero overhead was ~35% of decode
  // time at 2 MiB segments)
  thread_local Decoder d;
  return d.run(src, src_len, dst, cap);
}

#ifdef OTZ_PROF
void otz_prof_read(uint64_t* out) {
  for (int i = 0; i < 8; i++) out[i] = g_prof[i];
}
#endif

}  // extern "C"

// Standalone decode benchmark: g++ -O3 -DOTZ_MAIN [-DOTZ_PROF] otz_core.cpp
//   ./a.out SEGMENT_FILE [reps]     (file = one raw OTZ segment payload)
#ifdef OTZ_MAIN
#include <chrono>
#include <cstdio>
#include <cstdlib>

int main(int argc, char** argv) {
  if (argc < 2) return 1;
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> src(n);
  if (fread(src.data(), 1, n, f) != (size_t)n) return 1;
  fclose(f);
  int reps = argc > 2 ? atoi(argv[2]) : 5;
  int64_t raw = otz_raw_len(src.data(), n);
  std::vector<uint8_t> dst(raw);
  double best = 1e30;
  for (int r = 0; r < reps; r++) {
    auto t0 = std::chrono::steady_clock::now();
    int64_t rc = otz_decode_segment(src.data(), n, dst.data(), raw);
    double dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    if (rc != raw) { fprintf(stderr, "decode error %lld\n", (long long)rc); return 2; }
    if (dt < best) best = dt;
  }
  printf("decode: %ld -> %lld bytes, best %.3fs = %.1f MB/s\n",
         n, (long long)raw, best, raw / best / 1e6);
#ifdef OTZ_PROF
  uint64_t prof[8];
  otz_prof_read(prof);
  uint64_t tot = 0;
  for (int i = 0; i < 4; i++) tot += prof[i];
  const char* names[4] = {"words-catchup", "huffman", "symrank", "match"};
  for (int i = 0; i < 4; i++)
    printf("  %-14s %6.1f%% (%llu Mcyc)\n", names[i],
           100.0 * prof[i] / (tot ? tot : 1), (unsigned long long)(prof[i] >> 20));
#endif
  return 0;
}
#endif
