// tpulz4: native C++ tier of the tpu-lz4 framework.
//
// This is the framework's "native instance" — the role lz4-java's JNI-to-C
// tier plays (reference: src/jni/net_jpountz_lz4_LZ4JNI.c,
// net_jpountz_xxhash_XXHashJNI.c). Written from scratch against the LZ4
// block-format spec with the same search heuristics as the reference codecs
// (hash-table fast scan with skip acceleration; HC chained match finder with
// lazy 3-match optimization) so compressed output is byte-identical to the
// framework's pure-Python "safe" tier — which the test suite asserts.
//
// Exposed as a flat C ABI consumed via ctypes (lz4_tpu/native/bindings.py).
// Error convention: negative return values, see TPULZ4_E* below.

#include <atomic>
#if defined(__AVX2__)
#include <immintrin.h>
#endif
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <memory>
#include <mutex>
#include <vector>
#include <thread>

#if defined(_WIN32)
#define TPULZ4_API extern "C" __declspec(dllexport)
#else
#define TPULZ4_API extern "C" __attribute__((visibility("default")))
#endif

// single source of truth for the ABI version surface; must track the Python
// package version (lz4_tpu/__init__.py) — pinned by tests/test_native.py
#define TPULZ4_VERSION_STR "0.5.0"

namespace {

// ---- constants (LZ4Constants.java:23-53 equivalents) ----
constexpr int MIN_MATCH = 4;
constexpr int HASH_LOG = 12;
constexpr int HASH_LOG_64K = 13;
constexpr int HASH_LOG_HC = 15;
constexpr int SKIP_STRENGTH = 6;
constexpr int COPY_LENGTH = 8;
constexpr int LAST_LITERALS = 5;
constexpr int MF_LIMIT = COPY_LENGTH + MIN_MATCH;
constexpr int MIN_LENGTH = MF_LIMIT + 1;
constexpr int MAX_DISTANCE = 1 << 16;
constexpr int ML_BITS = 4;
constexpr int ML_MASK = (1 << ML_BITS) - 1;
constexpr int RUN_MASK = ML_MASK;
constexpr int LZ4_64K_LIMIT = (1 << 16) + (MF_LIMIT - 1);
constexpr int OPTIMAL_ML = ML_MASK - 1 + MIN_MATCH;
constexpr uint32_t HASH_MULT = 2654435761u;

inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86/arm64); matches readIntLE
}

inline uint64_t read64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

inline uint32_t hash_general(uint32_t v) { return (v * HASH_MULT) >> (32 - HASH_LOG); }
inline uint32_t hash_64k(uint32_t v) { return (v * HASH_MULT) >> (32 - HASH_LOG_64K); }
inline uint32_t hash_hc(uint32_t v) { return (v * HASH_MULT) >> (32 - HASH_LOG_HC); }

inline int common_bytes(const uint8_t* b, int o1, int o2, int limit) {
  int count = 0;
  while (o2 + count + 8 <= limit) {
    uint64_t x = read64(b + o1 + count) ^ read64(b + o2 + count);
    if (x) return count + (__builtin_ctzll(x) >> 3);
    count += 8;
  }
  while (o2 + count < limit && b[o1 + count] == b[o2 + count]) ++count;
  return count;
}

inline int common_bytes_backward(const uint8_t* b, int o1, int o2, int l1, int l2) {
  int count = 0;
  while (o1 - count > l1 && o2 - count > l2 && b[o1 - count - 1] == b[o2 - count - 1]) ++count;
  return count;
}

inline int write_len(int len, uint8_t* dest, int d) {
  while (len >= 0xFF) { dest[d++] = 0xFF; len -= 0xFF; }
  dest[d++] = (uint8_t)len;
  return d;
}

}  // namespace

// error codes
constexpr int TPULZ4_E_DEST_TOO_SMALL = -1;
constexpr int TPULZ4_E_MALFORMED = -2;
constexpr int TPULZ4_E_PARAM = -3;

// ---------------------------------------------------------------------------
// fast-scan compressor
// ---------------------------------------------------------------------------

// guarded region (callers ensure >= COPY_LENGTH slack or exact tail)
static inline void wild_copy8(uint8_t* dst, const uint8_t* src, int len) {
  uint8_t* d = dst;
  const uint8_t* s = src;
  uint8_t* end = dst + len;
  do {
    std::memcpy(d, s, 8);
    d += 8;
    s += 8;
  } while (d < end);
}

static inline void wild_copy16(uint8_t* dst, const uint8_t* src, int len) {
  uint8_t* d = dst;
  const uint8_t* s = src;
  uint8_t* end = dst + len;
  do {
    std::memcpy(d, s, 16);
    d += 16;
    s += 16;
  } while (d < end);
}

// pointer helpers shared by the two compressors
inline uint16_t read16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

inline int common_bytes_p(const uint8_t* a, const uint8_t* b,
                          const uint8_t* b_limit) {
  int count = 0;
  // typical extensions are short (text ~0-16 B): keep the first two strides
  // scalar so the common case pays no vector-entry branch
  while (b + count + 8 <= b_limit) {
    uint64_t x = read64(a + count) ^ read64(b + count);
    if (x) return count + (__builtin_ctzll(x) >> 3);
    count += 8;
    if (count >= 16) break;
  }
#if defined(__AVX2__)
  // long-match extension at 32 B/iter: unlike the hash stripes (a serial
  // dependency chain where SIMD lost to scalar), the compare stream is
  // independent loads — pure throughput, measured ~1.4x on run-heavy data
  if (count == 16) {
    while (b + count + 32 <= b_limit) {
      __m256i va = _mm256_loadu_si256((const __m256i*)(a + count));
      __m256i vb = _mm256_loadu_si256((const __m256i*)(b + count));
      uint32_t eq = (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(va, vb));
      if (eq != 0xFFFFFFFFu) return count + __builtin_ctz(~eq);
      count += 32;
    }
  }
#endif
  while (b + count + 8 <= b_limit) {
    uint64_t x = read64(a + count) ^ read64(b + count);
    if (x) return count + (__builtin_ctzll(x) >> 3);
    count += 8;
  }
  // exact 4/2/1 tail (same longest-common-prefix as a byte loop, fewer
  // dependent iterations; all reads stay below b_limit + LAST_LITERALS)
  if (b + count + 4 <= b_limit && read32(a + count) == read32(b + count))
    count += 4;
  if (b + count + 2 <= b_limit && read16(a + count) == read16(b + count))
    count += 2;
  if (b + count < b_limit && a[count] == b[count]) ++count;
  return count;
}

inline uint8_t* write_len_p(int len, uint8_t* d) {
  while (len >= 0xFF) { *d++ = 0xFF; len -= 0xFF; }
  *d++ = (uint8_t)len;
  return d;
}

// exact number of length-extension bytes a run/match of `len` emits via
// write_len_p (0 when it fits in the token nibble). The reference's Java
// tiers use a (len >>> 8) estimate and rely on checked arrays to catch the
// rare under-reserve on multi-hundred-KB runs; C++ needs the exact bound.
inline int len_ext_bytes(int len, int mask) {
  return len >= mask ? (len - mask) / 255 + 1 : 0;
}

// pointer-based hot loop (same interleaved-A/B rationale as the decoders:
// ~15% over index arithmetic on this host); emission order and heuristics
// are exactly compress.template:16-131, so output bytes are unchanged
static int compress64k(const uint8_t* src, int src_len, uint8_t* dest, int dest_cap) {
  const uint8_t* const send = src + src_len;
  const uint8_t* const slimit = send - LAST_LITERALS;
  const uint8_t* const mflimit = send - MF_LIMIT;
  const uint8_t* anchor = src;
  const uint8_t* ip = src;
  uint8_t* op = dest;
  uint8_t* const oend = dest + dest_cap;

  if (src_len >= MIN_LENGTH) {
    std::vector<uint16_t> table(1 << HASH_LOG_64K, 0);
    ++ip;
    for (;;) {
      // find a match with skip acceleration; the hash of the NEXT candidate
      // is computed while the current table probe resolves (pure
      // scheduling: probe order and table updates are unchanged, so the
      // output stays byte-identical)
      const uint8_t* fwd = ip;
      int step = 1;
      int search_match_nb = 1 << SKIP_STRENGTH;
      const uint8_t* ref;
      uint32_t h = hash_64k(read32(fwd));
      do {
        ip = fwd;
        fwd += step;
        step = search_match_nb++ >> SKIP_STRENGTH;
        if (fwd > mflimit) goto last;
        uint32_t next_h = hash_64k(read32(fwd));
        ref = src + table[h];
        table[h] = (uint16_t)(ip - src);
        h = next_h;
      } while (read32(ref) != read32(ip));

      {
        while (ip > anchor && ref > src && ip[-1] == ref[-1]) { --ip; --ref; }

        int run_len = (int)(ip - anchor);
        uint8_t* token = op++;
        if (op + run_len + (2 + 1 + LAST_LITERALS) + (run_len >> 8) > oend)
          return TPULZ4_E_DEST_TOO_SMALL;
        if (run_len >= RUN_MASK) {
          *token = RUN_MASK << ML_BITS;
          op = write_len_p(run_len - RUN_MASK, op);
        } else {
          *token = (uint8_t)(run_len << ML_BITS);
        }
        // wild 8-byte strides when the rounded-up end provably fits (see
        // the general path's note); exact copy otherwise
        if (op + run_len + 16 <= oend) {
          wild_copy8(op, anchor, run_len > 0 ? run_len : 1);
        } else {
          std::memcpy(op, anchor, run_len);
        }
        op += run_len;

        for (;;) {
          int back = (int)(ip - ref);
          op[0] = (uint8_t)back;
          op[1] = (uint8_t)(back >> 8);
          op += 2;

          ip += MIN_MATCH;
          ref += MIN_MATCH;
          int match_len = common_bytes_p(ref, ip, slimit);
          if (op + (1 + LAST_LITERALS) + (match_len >> 8) > oend)
            return TPULZ4_E_DEST_TOO_SMALL;
          ip += match_len;

          if (match_len >= ML_MASK) {
            *token |= ML_MASK;
            op = write_len_p(match_len - ML_MASK, op);
          } else {
            *token |= (uint8_t)match_len;
          }

          if (ip > mflimit) { anchor = ip; goto last; }

          table[hash_64k(read32(ip - 2))] = (uint16_t)(ip - 2 - src);
          uint32_t h = hash_64k(read32(ip));
          ref = src + table[h];
          table[h] = (uint16_t)(ip - src);
          if (read32(ip) != read32(ref)) break;

          token = op++;
          *token = 0;
        }
        anchor = ip++;
      }
    }
  }
last:
  {
    int run_len = (int)(send - anchor);
    if (op + run_len + 1 + (run_len + 255 - RUN_MASK) / 255 > oend)
      return TPULZ4_E_DEST_TOO_SMALL;
    if (run_len >= RUN_MASK) {
      *op++ = RUN_MASK << ML_BITS;
      op = write_len_p(run_len - RUN_MASK, op);
    } else {
      *op++ = (uint8_t)(run_len << ML_BITS);
    }
    std::memcpy(op, anchor, run_len);
    op += run_len;
  }
  return (int)(op - dest);
}

static int compress_general(const uint8_t* src, int src_len, uint8_t* dest, int dest_cap) {
  const uint8_t* const send = src + src_len;
  const uint8_t* const slimit = send - LAST_LITERALS;
  const uint8_t* const mflimit = send - MF_LIMIT;
  const uint8_t* anchor = src;
  const uint8_t* ip = src + 1;
  uint8_t* op = dest;
  uint8_t* const oend = dest + dest_cap;

  std::vector<int32_t> table(1 << HASH_LOG, 0);  // init to anchor == 0

  for (;;) {
    // next-candidate hash preloaded while the current probe resolves
    // (scheduling only; probe order and table updates unchanged)
    const uint8_t* fwd = ip;
    int step = 1;
    int search_match_nb = 1 << SKIP_STRENGTH;
    const uint8_t* ref;
    int back;
    uint32_t h = hash_general(read32(fwd));
    do {
      ip = fwd;
      fwd += step;
      step = search_match_nb++ >> SKIP_STRENGTH;
      if (fwd > mflimit) goto last;
      uint32_t next_h = hash_general(read32(fwd));
      ref = src + table[h];
      back = (int)(ip - ref);
      table[h] = (int32_t)(ip - src);
      h = next_h;
    } while (back >= MAX_DISTANCE || read32(ref) != read32(ip));

    {
      while (ip > anchor && ref > src && ip[-1] == ref[-1]) { --ip; --ref; }

      int run_len = (int)(ip - anchor);
      uint8_t* token = op++;
      if (op + run_len + (2 + 1 + LAST_LITERALS)
              + len_ext_bytes(run_len, RUN_MASK) > oend)
        return TPULZ4_E_DEST_TOO_SMALL;
      if (run_len >= RUN_MASK) {
        *token = RUN_MASK << ML_BITS;
        op = write_len_p(run_len - RUN_MASK, op);
      } else {
        *token = (uint8_t)(run_len << ML_BITS);
      }
      // wild 8-byte strides when the rounded-up copy end provably fits
      // (the sequence bound check above reserves run_len + 8 AFTER the
      // length bytes, which can undercut the +7 wild rounding by a byte —
      // caught by review, regression-tested); offset bytes written next
      // overwrite slop
      if (op + run_len + 16 <= oend) {
        wild_copy8(op, anchor, run_len > 0 ? run_len : 1);
      } else {
        std::memcpy(op, anchor, run_len);
      }
      op += run_len;

      for (;;) {
        op[0] = (uint8_t)back;
        op[1] = (uint8_t)(back >> 8);
        op += 2;

        ip += MIN_MATCH;
        int match_len = common_bytes_p(ref + MIN_MATCH, ip, slimit);
        if (op + (1 + LAST_LITERALS)
                + len_ext_bytes(match_len, ML_MASK) > oend)
          return TPULZ4_E_DEST_TOO_SMALL;
        ip += match_len;

        if (match_len >= ML_MASK) {
          *token |= ML_MASK;
          op = write_len_p(match_len - ML_MASK, op);
        } else {
          *token |= (uint8_t)match_len;
        }

        if (ip > mflimit) { anchor = ip; goto last; }

        table[hash_general(read32(ip - 2))] = (int32_t)(ip - 2 - src);
        uint32_t h = hash_general(read32(ip));
        ref = src + table[h];
        table[h] = (int32_t)(ip - src);
        back = (int)(ip - ref);
        if (back >= MAX_DISTANCE || read32(ref) != read32(ip)) break;

        token = op++;
        *token = 0;
      }
      anchor = ip++;
    }
  }
last:
  {
    int run_len = (int)(send - anchor);
    if (op + run_len + 1 + (run_len + 255 - RUN_MASK) / 255 > oend)
      return TPULZ4_E_DEST_TOO_SMALL;
    if (run_len >= RUN_MASK) {
      *op++ = RUN_MASK << ML_BITS;
      op = write_len_p(run_len - RUN_MASK, op);
    } else {
      *op++ = (uint8_t)(run_len << ML_BITS);
    }
    std::memcpy(op, anchor, run_len);
    op += run_len;
  }
  return (int)(op - dest);
}

TPULZ4_API int tpulz4_compress_fast(const uint8_t* src, int src_len,
                                    uint8_t* dest, int max_dest_len) {
  if (src_len < 0 || max_dest_len < 0) return TPULZ4_E_PARAM;
  if (src_len < LZ4_64K_LIMIT) return compress64k(src, src_len, dest, max_dest_len);
  return compress_general(src, src_len, dest, max_dest_len);
}

// Dictionary ("prefix") fast-scan compressor: `hist_len` dictionary bytes
// lie contiguously BEFORE `src`; matches may reference them at distances
// up to MAX_DISTANCE. The hash table holds offsets relative to
// wbase = src - hist_len and is pre-seeded with dictionary positions at
// stride 3 (the policy lz4.c's LZ4_loadDict uses — there is no reference
// byte stream to match here: the reference has no dictionary support at
// all, so this is an extension constrained only by format validity).
// Output decodes with the history-extended decoder
// (tpulz4_decompress_safe_ext) and with upstream LZ4 usingDict.
static int compress_ext(const uint8_t* src, int src_len, int hist_len,
                        uint8_t* dest, int dest_cap) {
  const uint8_t* const wbase = src - hist_len;
  const uint8_t* const send = src + src_len;
  const uint8_t* const slimit = send - LAST_LITERALS;
  const uint8_t* const mflimit = send - MF_LIMIT;
  const uint8_t* anchor = src;
  const uint8_t* ip = src;
  uint8_t* op = dest;
  uint8_t* const oend = dest + dest_cap;

  std::vector<int32_t> table(1 << HASH_LOG, 0);
  for (int p = 0; p + 4 <= hist_len; p += 3)
    table[hash_general(read32(wbase + p))] = p;

  if (src_len >= MIN_LENGTH) {
    for (;;) {
      const uint8_t* fwd = ip;
      int step = 1;
      int search_match_nb = 1 << SKIP_STRENGTH;
      const uint8_t* ref;
      int back;
      uint32_t h = hash_general(read32(fwd));
      do {
        ip = fwd;
        fwd += step;
        step = search_match_nb++ >> SKIP_STRENGTH;
        if (fwd > mflimit) goto last;
        uint32_t next_h = hash_general(read32(fwd));
        ref = wbase + table[h];
        back = (int)(ip - ref);
        table[h] = (int32_t)(ip - wbase);
        h = next_h;
        // back == 0 only for the table-init pseudo-entry at wbase[0] when
        // ip has not been inserted yet; a 0-distance match is invalid
      } while (back >= MAX_DISTANCE || back == 0 || read32(ref) != read32(ip));

      {
        while (ip > anchor && ref > wbase && ip[-1] == ref[-1]) { --ip; --ref; }

        int run_len = (int)(ip - anchor);
        uint8_t* token = op++;
        if (op + run_len + (2 + 1 + LAST_LITERALS)
                + len_ext_bytes(run_len, RUN_MASK) > oend)
          return TPULZ4_E_DEST_TOO_SMALL;
        if (run_len >= RUN_MASK) {
          *token = RUN_MASK << ML_BITS;
          op = write_len_p(run_len - RUN_MASK, op);
        } else {
          *token = (uint8_t)(run_len << ML_BITS);
        }
        if (op + run_len + 16 <= oend) {
          wild_copy8(op, anchor, run_len > 0 ? run_len : 1);
        } else {
          std::memcpy(op, anchor, run_len);
        }
        op += run_len;

        for (;;) {
          op[0] = (uint8_t)back;
          op[1] = (uint8_t)(back >> 8);
          op += 2;

          ip += MIN_MATCH;
          int match_len = common_bytes_p(ref + MIN_MATCH, ip, slimit);
          if (op + (1 + LAST_LITERALS)
                  + len_ext_bytes(match_len, ML_MASK) > oend)
            return TPULZ4_E_DEST_TOO_SMALL;
          ip += match_len;

          if (match_len >= ML_MASK) {
            *token |= ML_MASK;
            op = write_len_p(match_len - ML_MASK, op);
          } else {
            *token |= (uint8_t)match_len;
          }

          if (ip > mflimit) { anchor = ip; goto last; }

          table[hash_general(read32(ip - 2))] = (int32_t)(ip - 2 - wbase);
          uint32_t h = hash_general(read32(ip));
          ref = wbase + table[h];
          table[h] = (int32_t)(ip - wbase);
          back = (int)(ip - ref);
          if (back >= MAX_DISTANCE || back == 0 || read32(ref) != read32(ip))
            break;

          token = op++;
          *token = 0;
        }
        anchor = ip++;
      }
    }
  }
last:
  {
    int run_len = (int)(send - anchor);
    if (op + run_len + 1 + (run_len + 255 - RUN_MASK) / 255 > oend)
      return TPULZ4_E_DEST_TOO_SMALL;
    if (run_len >= RUN_MASK) {
      *op++ = RUN_MASK << ML_BITS;
      op = write_len_p(run_len - RUN_MASK, op);
    } else {
      *op++ = (uint8_t)(run_len << ML_BITS);
    }
    std::memcpy(op, anchor, run_len);
    op += run_len;
  }
  return (int)(op - dest);
}

TPULZ4_API int tpulz4_compress_fast_ext(const uint8_t* src, int src_len,
                                        int hist_len, uint8_t* dest,
                                        int max_dest_len) {
  if (src_len < 0 || max_dest_len < 0 || hist_len < 0) return TPULZ4_E_PARAM;
  if (hist_len == 0)
    return tpulz4_compress_fast(src, src_len, dest, max_dest_len);
  return compress_ext(src, src_len, hist_len, dest, max_dest_len);
}

// ---------------------------------------------------------------------------
// turbo fast-scan (opt-in): modern match heuristic on the >64KB general
// path. Output is valid LZ4 block format but NOT byte-identical to the
// reference Java algorithm — the same freedom the reference's own fastest
// tier takes: its JNI path calls modern LZ4_compress_default
// (net_jpountz_lz4_LZ4JNI.c:75), which does not reproduce the Java tiers'
// bytes either (README.md:33-36). Differences from compress_general:
//  - candidate hashing covers 5 bytes (Fibonacci multiply-shift on the low
//    40 bits of one 64-bit read) instead of 4: on a 64KB-window general
//    path, a 4-byte hash keyed on frequent n-grams keeps probing and
//    replacing the same slots; 5 bytes cuts the false-probe rate and biases
//    the table toward longer matches
//  - a wider table (template param, default TURBO_HASH_LOG): the reference
//    inherits lz4's 16KB design point; a 13-bit/32KB table is still
//    L1/L2-resident on current hosts and halves slot collisions
//  - 16-byte wild literal strides (the reserve check already bounds slack)
// The <64KB path stays compress64k: it is already at per-core parity and
// byte-identical, so turbo only diverges where the heuristic gap is.
static constexpr int TURBO_HASH_LOG = 13;

template <int LOG>
inline uint32_t hash_turbo(uint64_t v) {
  // low 5 bytes of a little-endian read, golden-ratio multiply, top bits
  return (uint32_t)(((v << 24) * 0x9E3779B97F4A7C15ull) >> (64 - LOG));
}

template <int LOG>
static int compress_turbo_general(const uint8_t* src, int src_len,
                                  uint8_t* dest, int dest_cap) {
  const uint8_t* const send = src + src_len;
  const uint8_t* const slimit = send - LAST_LITERALS;
  const uint8_t* const mflimit = send - MF_LIMIT;
  const uint8_t* anchor = src;
  const uint8_t* ip = src + 1;
  uint8_t* op = dest;
  uint8_t* const oend = dest + dest_cap;

  std::vector<int32_t> table(1 << LOG, 0);  // init to anchor == 0

  for (;;) {
    const uint8_t* fwd = ip;
    int step = 1;
    int search_match_nb = 1 << SKIP_STRENGTH;
    const uint8_t* ref;
    int back;
    uint32_t h = hash_turbo<LOG>(read64(fwd));
    do {
      ip = fwd;
      fwd += step;
      step = search_match_nb++ >> SKIP_STRENGTH;
      if (fwd > mflimit) goto last;
      uint32_t next_h = hash_turbo<LOG>(read64(fwd));
      ref = src + table[h];
      back = (int)(ip - ref);
      table[h] = (int32_t)(ip - src);
      h = next_h;
    } while (back >= MAX_DISTANCE || read32(ref) != read32(ip));

    {
      while (ip > anchor && ref > src && ip[-1] == ref[-1]) { --ip; --ref; }

      int run_len = (int)(ip - anchor);
      uint8_t* token = op++;
      if (op + run_len + (2 + 1 + LAST_LITERALS)
              + len_ext_bytes(run_len, RUN_MASK) > oend)
        return TPULZ4_E_DEST_TOO_SMALL;
      if (run_len >= RUN_MASK) {
        *token = RUN_MASK << ML_BITS;
        op = write_len_p(run_len - RUN_MASK, op);
      } else {
        *token = (uint8_t)(run_len << ML_BITS);
      }
      // 16-byte wild strides overshoot by < 16 bytes on BOTH sides: the
      // +24 reserve bounds the dest, and ip + 16 <= send bounds the source
      // reads (literals end at ip; ip can sit as close as send - 12)
      if (op + run_len + 24 <= oend && ip + 16 <= send) {
        wild_copy16(op, anchor, run_len > 0 ? run_len : 1);
      } else if (op + run_len + 16 <= oend) {
        wild_copy8(op, anchor, run_len > 0 ? run_len : 1);
      } else {
        std::memcpy(op, anchor, run_len);
      }
      op += run_len;

      for (;;) {
        op[0] = (uint8_t)back;
        op[1] = (uint8_t)(back >> 8);
        op += 2;

        ip += MIN_MATCH;
        int match_len = common_bytes_p(ref + MIN_MATCH, ip, slimit);
        if (op + (1 + LAST_LITERALS)
                + len_ext_bytes(match_len, ML_MASK) > oend)
          return TPULZ4_E_DEST_TOO_SMALL;
        ip += match_len;

        if (match_len >= ML_MASK) {
          *token |= ML_MASK;
          op = write_len_p(match_len - ML_MASK, op);
        } else {
          *token |= (uint8_t)match_len;
        }

        if (ip > mflimit) { anchor = ip; goto last; }

        table[hash_turbo<LOG>(read64(ip - 2))] = (int32_t)(ip - 2 - src);
        uint32_t h2 = hash_turbo<LOG>(read64(ip));
        ref = src + table[h2];
        table[h2] = (int32_t)(ip - src);
        back = (int)(ip - ref);
        if (back >= MAX_DISTANCE || read32(ref) != read32(ip)) break;

        token = op++;
        *token = 0;
      }
      anchor = ip++;
    }
  }
last:
  {
    int run_len = (int)(send - anchor);
    if (op + run_len + 1 + (run_len + 255 - RUN_MASK) / 255 > oend)
      return TPULZ4_E_DEST_TOO_SMALL;
    if (run_len >= RUN_MASK) {
      *op++ = RUN_MASK << ML_BITS;
      op = write_len_p(run_len - RUN_MASK, op);
    } else {
      *op++ = (uint8_t)(run_len << ML_BITS);
    }
    std::memcpy(op, anchor, run_len);
    op += run_len;
  }
  return (int)(op - dest);
}

TPULZ4_API int tpulz4_compress_turbo(const uint8_t* src, int src_len,
                                     uint8_t* dest, int max_dest_len) {
  if (src_len < 0 || max_dest_len < 0) return TPULZ4_E_PARAM;
  if (src_len < LZ4_64K_LIMIT) return compress64k(src, src_len, dest, max_dest_len);
  return compress_turbo_general<TURBO_HASH_LOG>(src, src_len, dest, max_dest_len);
}

// experiment hook: turbo at an explicit table size (A/B table-geometry
// sweeps in tools/; not part of the public surface)
TPULZ4_API int tpulz4_compress_turbo_probe(const uint8_t* src, int src_len,
                                           uint8_t* dest, int max_dest_len,
                                           int log) {
  if (src_len < 0 || max_dest_len < 0) return TPULZ4_E_PARAM;
  switch (log) {
    case 12: return compress_turbo_general<12>(src, src_len, dest, max_dest_len);
    case 13: return compress_turbo_general<13>(src, src_len, dest, max_dest_len);
    case 14: return compress_turbo_general<14>(src, src_len, dest, max_dest_len);
    case 15: return compress_turbo_general<15>(src, src_len, dest, max_dest_len);
    default: return TPULZ4_E_PARAM;
  }
}

TPULZ4_API int tpulz4_max_compressed_length(int length) {
  if (length < 0 || length >= 0x7E000000) return TPULZ4_E_PARAM;
  return length + length / 255 + 16;
}

// ---------------------------------------------------------------------------
// HC compressor (chained match finder + lazy 3-match optimizer)
// ---------------------------------------------------------------------------

namespace hc {

struct Match {
  int start = 0, ref = 0, len = 0;
  void fix(int correction) { start += correction; ref += correction; len -= correction; }
  int end() const { return start + len; }
};

struct HashTable {
  int next_to_update = 0;
  std::vector<int32_t> head;
  std::vector<uint16_t> chain;
  int max_attempts;

  explicit HashTable(int attempts)
      : head(1 << HASH_LOG_HC, -1), chain(MAX_DISTANCE, 0), max_attempts(attempts) {}

  int next(int off) const { return off - chain[off & (MAX_DISTANCE - 1)]; }

  void add_hash(const uint8_t* src, int off) {
    uint32_t h = hash_hc(read32(src + off));
    int delta = off - head[h];
    if (delta >= MAX_DISTANCE) delta = MAX_DISTANCE - 1;
    chain[off & (MAX_DISTANCE - 1)] = (uint16_t)delta;
    head[h] = off;
  }

  void insert(int off, const uint8_t* src) {
    for (; next_to_update < off; ++next_to_update) add_hash(src, next_to_update);
  }

  bool insert_and_find_best_match(const uint8_t* src, int off, int match_limit, Match& m) {
    m.start = off;
    m.len = 0;
    int delta = 0, repl = 0;

    insert(off, src);
    int ref = head[hash_hc(read32(src + off))];

    if (ref >= off - 4 && ref <= off && ref >= 0) {  // potential repetition
      if (read32(src + ref) == read32(src + off)) {
        delta = off - ref;
        repl = m.len = MIN_MATCH + common_bytes(src, ref + MIN_MATCH, off + MIN_MATCH, match_limit);
        m.ref = ref;
      }
      ref = next(ref);
    }

    int lo = off - MAX_DISTANCE + 1;
    if (lo < 0) lo = 0;
    const uint32_t want = read32(src + off);
    for (int i = 0; i < max_attempts; ++i) {
      if (ref < lo || ref > off) break;
      // Hoist the chain hop and touch the next candidate's bytes before the
      // (L2-resident) compare + extension work of this one; the walk is a
      // dependent-load chain, so this is the only latency worth hiding.
      const int nxt = next(ref);
      __builtin_prefetch(src + nxt);
      __builtin_prefetch(&chain[nxt & (MAX_DISTANCE - 1)]);
      if (read32(src + ref) == want) {
        int len = MIN_MATCH + common_bytes(src, ref + MIN_MATCH, off + MIN_MATCH, match_limit);
        if (len > m.len) { m.ref = ref; m.len = len; }
      }
      ref = nxt;
    }

    if (repl != 0) {
      int ptr = off;
      const int end = off + repl - (MIN_MATCH - 1);
      while (ptr < end - delta) {
        chain[ptr & (MAX_DISTANCE - 1)] = (uint16_t)delta;
        ++ptr;
      }
      do {
        chain[ptr & (MAX_DISTANCE - 1)] = (uint16_t)delta;
        head[hash_hc(read32(src + ptr))] = ptr;
        ++ptr;
      } while (ptr < end);
      next_to_update = end;
    }
    return m.len != 0;
  }

  bool insert_and_find_wider_match(const uint8_t* src, int off, int start_limit,
                                   int match_limit, int min_len, Match& m) {
    m.len = min_len;
    insert(off, src);
    int ref = head[hash_hc(read32(src + off))];
    int lo = off - MAX_DISTANCE + 1;
    if (lo < 0) lo = 0;
    const uint32_t want = read32(src + off);
    for (int i = 0; i < max_attempts; ++i) {
      if (ref < lo || ref > off) break;
      const int nxt = next(ref);
      __builtin_prefetch(src + nxt);
      __builtin_prefetch(&chain[nxt & (MAX_DISTANCE - 1)]);
      if (read32(src + ref) == want) {
        int fwd = MIN_MATCH + common_bytes(src, ref + MIN_MATCH, off + MIN_MATCH, match_limit);
        int bwd = common_bytes_backward(src, ref, off, 0, start_limit);
        int len = bwd + fwd;
        if (len > m.len) {
          m.len = len;
          m.ref = ref - bwd;
          m.start = off - bwd;
        }
      }
      ref = nxt;
    }
    return m.len > min_len;
  }
};

static int encode_sequence(const uint8_t* src, int anchor, int match_off, int match_ref,
                           int match_len, uint8_t* dest, int d, int dest_end) {
  int run_len = match_off - anchor;
  int token_off = d++;
  // exact extension-byte bound: HC input length is unbounded, so the Java
  // tiers' (len >>> 8) estimate under-reserves by more than the fixed slack
  // once a literal run passes ~280KB and would write past dest_end
  if (d + run_len + (2 + 1 + LAST_LITERALS) + len_ext_bytes(run_len, RUN_MASK) > dest_end)
    return TPULZ4_E_DEST_TOO_SMALL;

  int token;
  if (run_len >= RUN_MASK) {
    token = RUN_MASK << ML_BITS;
    d = write_len(run_len - RUN_MASK, dest, d);
  } else {
    token = run_len << ML_BITS;
  }
  std::memcpy(dest + d, src + anchor, run_len);
  d += run_len;

  int match_dec = match_off - match_ref;
  dest[d++] = (uint8_t)match_dec;
  dest[d++] = (uint8_t)(match_dec >> 8);

  match_len -= 4;
  if (d + (1 + LAST_LITERALS) + len_ext_bytes(match_len, ML_MASK) > dest_end)
    return TPULZ4_E_DEST_TOO_SMALL;
  if (match_len >= ML_MASK) {
    token |= ML_MASK;
    d = write_len(match_len - RUN_MASK, dest, d);
  } else {
    token |= match_len;
  }
  dest[token_off] = (uint8_t)token;
  return d;
}

}  // namespace hc

TPULZ4_API int tpulz4_compress_hc(const uint8_t* src, int src_len,
                                  uint8_t* dest, int max_dest_len, int level) {
  using hc::Match;
  if (src_len < 0 || max_dest_len < 0 || level < 1 || level > 17) return TPULZ4_E_PARAM;

  const int src_end = src_len;
  const int dest_end = max_dest_len;
  const int mf_limit = src_end - MF_LIMIT;
  const int match_limit = src_end - LAST_LITERALS;

  int s = 0, d = 0;
  int anchor = s++;

  hc::HashTable ht(1 << (level - 1));
  Match m0, m1, m2, m3;

  while (s < mf_limit) {
    if (!ht.insert_and_find_best_match(src, s, match_limit, m1)) {
      ++s;
      continue;
    }
    m0 = m1;  // keep the original candidate; the lazy search below may
              // need to fall back to it

    bool to_main = false;
    while (!to_main) {  // search2
      if (m1.end() >= mf_limit ||
          !ht.insert_and_find_wider_match(src, m1.end() - 2, m1.start + 1,
                                          match_limit, m1.len, m2)) {
        d = hc::encode_sequence(src, anchor, m1.start, m1.ref, m1.len, dest, d, dest_end);
        if (d < 0) return d;
        anchor = s = m1.end();
        break;  // continue main
      }

      // heuristic the upstream format's HC encoder applies (must be
      // mirrored exactly for byte-identical output): if the overlapping
      // wider match would start inside the span the original candidate
      // covers, revert to the original candidate
      if (m0.start < m1.start && m2.start < m1.start + m0.len) m1 = m0;

      if (m2.start - m1.start < 3) {  // first match too small
        m1 = m2;
        continue;  // search2
      }

      bool to_search2 = false;
      while (!to_search2) {  // search3
        if (m2.start - m1.start < OPTIMAL_ML) {
          int new_len = m1.len;
          if (new_len > OPTIMAL_ML) new_len = OPTIMAL_ML;
          if (m1.start + new_len > m2.end() - MIN_MATCH)
            new_len = m2.start - m1.start + m2.len - MIN_MATCH;
          int correction = new_len - (m2.start - m1.start);
          if (correction > 0) m2.fix(correction);
        }

        if (m2.start + m2.len >= mf_limit ||
            !ht.insert_and_find_wider_match(src, m2.end() - 3, m2.start,
                                            match_limit, m2.len, m3)) {
          // no better match: two sequences to encode
          if (m2.start < m1.end()) m1.len = m2.start - m1.start;
          d = hc::encode_sequence(src, anchor, m1.start, m1.ref, m1.len, dest, d, dest_end);
          if (d < 0) return d;
          anchor = s = m1.end();
          d = hc::encode_sequence(src, anchor, m2.start, m2.ref, m2.len, dest, d, dest_end);
          if (d < 0) return d;
          anchor = s = m2.end();
          to_main = true;
          break;
        }

        if (m3.start < m1.end() + 3) {  // not enough space for match 2
          if (m3.start >= m1.end()) {  // seq2 removed; seq3 becomes seq1
            if (m2.start < m1.end()) {
              int correction = m1.end() - m2.start;
              m2.fix(correction);
              if (m2.len < MIN_MATCH) m2 = m3;
            }
            d = hc::encode_sequence(src, anchor, m1.start, m1.ref, m1.len, dest, d, dest_end);
            if (d < 0) return d;
            anchor = s = m1.end();
            m1 = m3;
            m0 = m2;
            to_search2 = true;
            break;
          }
          m2 = m3;
          continue;  // search3
        }

        // three ascending matches; write at least the first one
        if (m2.start < m1.end()) {
          if (m2.start - m1.start < ML_MASK) {
            if (m1.len > OPTIMAL_ML) m1.len = OPTIMAL_ML;
            if (m1.end() > m2.end() - MIN_MATCH) m1.len = m2.end() - m1.start - MIN_MATCH;
            int correction = m1.end() - m2.start;
            m2.fix(correction);
          } else {
            m1.len = m2.start - m1.start;
          }
        }
        d = hc::encode_sequence(src, anchor, m1.start, m1.ref, m1.len, dest, d, dest_end);
        if (d < 0) return d;
        anchor = s = m1.end();
        m1 = m2;
        m2 = m3;
        // continue search3
      }
    }
  }

  {
    int run_len = src_end - anchor;
    if (d + run_len + 1 + (run_len + 255 - RUN_MASK) / 255 > dest_end)
      return TPULZ4_E_DEST_TOO_SMALL;
    if (run_len >= RUN_MASK) {
      dest[d++] = RUN_MASK << ML_BITS;
      d = write_len(run_len - RUN_MASK, dest, d);
    } else {
      dest[d++] = (uint8_t)(run_len << ML_BITS);
    }
    std::memcpy(dest + d, src + anchor, run_len);
    d += run_len;
  }
  return d;
}


static inline unsigned read16le(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;  // little-endian hosts only (as the rest of the loads assume)
}

// wild copy: 8/16-byte strided copies with overrun allowed inside the
// small-distance expansion tables (derived, see notes below). The output of
// an overlap match is periodic with period `dist`; after writing the first
// 8 bytes (4 byte-wise + one 4-byte copy whose source offset keeps reads
// behind the write cursor), the copy can continue reading at distance
// kRunDist8[dist] — the smallest multiple of dist that is >= 8 — which
// preserves the periodic pattern while making 8-byte strides safe.
static constexpr int kOverlapStep4[8] = {0, 1, 2, 1, 4, 4, 4, 4};
static constexpr int kRunDist8[8] = {8, 8, 8, 9, 8, 10, 12, 14};

// overlap-aware match copy with the small-distance expansion trick:
// bring the effective distance to >= 8 within the first 8 bytes, then
// wild-copy 8-byte strides
static inline void match_copy(uint8_t* dest, int match_off, int d, int dist,
                              int match_len, int dest_end) {
  uint8_t* dst = dest + d;
  const uint8_t* srcp = dest + match_off;
  if (d + match_len + 16 <= dest_end) {  // wild slack available
    if (dist >= 16) {
      wild_copy16(dst, srcp, match_len);
      return;
    }
    if (dist >= 8) {
      wild_copy8(dst, srcp, match_len);
      return;
    }
    // dist in [1, 8): expand to distance >= 8 within the first 8 bytes
    dst[0] = srcp[0];
    dst[1] = srcp[1];
    dst[2] = srcp[2];
    dst[3] = srcp[3];
    std::memcpy(dst + 4, srcp + kOverlapStep4[dist], 4);
    if (match_len > 8)
      wild_copy8(dst + 8, dst + 8 - kRunDist8[dist], match_len - 8);
    return;
  }

  // near the end of dest: no overrun allowed, exact copies only
  if (dist >= match_len) {  // disjoint regions: plain copy is exact
    std::memcpy(dst, srcp, (size_t)match_len);
    return;
  }
  if (dist >= 8) {          // overlapping, no wild slack: exact 8B strides
    int pos = 0;
    for (; pos + 8 <= match_len; pos += 8) std::memcpy(dst + pos, srcp + pos, 8);
    for (; pos < match_len; ++pos) dst[pos] = srcp[pos];
    return;
  }
  // dist in [1, 8): seed one period, then double from the output itself
  int pos = 0;
  int seed = dist < match_len ? dist : match_len;
  for (; pos < seed; ++pos) dst[pos] = srcp[pos];
  while (pos < match_len) {
    int chunk = pos < match_len - pos ? pos : match_len - pos;
    std::memcpy(dst + pos, dst, (size_t)chunk);
    pos += chunk;
  }
}

// ---------------------------------------------------------------------------
// decompressors
// ---------------------------------------------------------------------------

// Core safe decoder. `hist_len` > 0 extends the match window to that many
// contiguous bytes BEFORE `dest` (the linked-block mode of the frame spec:
// matches may reach up to 64KB into previously decoded output). hist_len=0
// is the independent-block decoder the reference implements
// (decompress.template:17-128); the reference refuses linked frames
// entirely (LZ4FrameOutputStream.java:361-363) — the extension is decode-
// only and opt-in at the frame layer.
static int decompress_safe_impl(const uint8_t* src, int src_len,
                                uint8_t* dest, int dest_len, int hist_len) {
  if (src_len < 0 || dest_len < 0 || hist_len < 0) return TPULZ4_E_PARAM;
  if (dest_len == 0) {
    if (src_len != 1 || src[0] != 0) return TPULZ4_E_MALFORMED;
    return 0;
  }

  // pointer-based hot loop (measured ~15% faster than index arithmetic on
  // this host via interleaved A/B); error semantics identical to the
  // index formulation and pinned by tests
  const uint8_t* ip = src;
  const uint8_t* const iend = src + src_len;
  uint8_t* op = dest;
  uint8_t* const wbase = dest - hist_len;  // window base (== dest when no history)
  uint8_t* const oend = dest + dest_len;
  // Split-shortcut envelopes. Literal shortcut: token consumed, blind 16B
  // literal copy + 2B distance readable => ip <= iend-16 (ll <= 14 so the
  // distance read at ip+ll+2 is covered too). Dest slack: 14 literal
  // bytes advance op, then the blind match copy writes 8+8+2 = 18 =>
  // op <= oend-32. A match that fails the blind test (ml == 15 or
  // dist < 8) falls through to the fully guarded match path with the
  // literals already copied.
  const uint8_t* const ishort = iend - 16;
  uint8_t* const oshort = oend - 32;

  for (;;) {
    if (ip >= iend) return TPULZ4_E_MALFORMED;
    unsigned token = *ip++;
    int literal_len = token >> ML_BITS;
    unsigned dist;

    if (__builtin_expect(literal_len != RUN_MASK && ip <= ishort &&
                         op <= oshort, 1)) {
      std::memcpy(op, ip, 16);
      ip += literal_len;
      op += literal_len;
      dist = read16le(ip);
      ip += 2;
      unsigned mlf = token & ML_MASK;
      if (__builtin_expect(mlf != ML_MASK && dist >= 8, 1)) {
        const uint8_t* match = op - dist;
        if (match < wbase) return TPULZ4_E_MALFORMED;
        // ml <= 18: two 8B strides + 2B tail (reads land on bytes the
        // first strides just wrote when dist < 18)
        std::memcpy(op, match, 8);
        std::memcpy(op + 8, match + 8, 8);
        std::memcpy(op + 16, match + 16, 2);
        op += mlf + MIN_MATCH;
        continue;
      }
      goto have_dist;  // long or overlapping match: guarded path
    }

    if (literal_len == RUN_MASK) {
      int b = 0xFF;
      while (ip < iend) {
        b = *ip++;
        if (b != 0xFF) break;
        literal_len += 0xFF;
        if (literal_len >= 0x7E000000) return TPULZ4_E_MALFORMED;
      }
      literal_len += b;
    }

    {
      uint8_t* lit_end = op + literal_len;
      if (lit_end > oend - COPY_LENGTH ||
          ip + literal_len > iend - COPY_LENGTH) {
        if (lit_end > oend) return TPULZ4_E_DEST_TOO_SMALL;
        if (ip + literal_len != iend) return TPULZ4_E_MALFORMED;
        std::memcpy(op, ip, literal_len);
        op = lit_end;
        break;  // EOF
      }
      if (literal_len > 0 && lit_end + 16 <= oend &&
          ip + literal_len + 16 <= iend) {
        wild_copy16(op, ip, literal_len);
      } else {
        std::memcpy(op, ip, literal_len);
      }
      ip += literal_len;
      op = lit_end;
    }

    dist = read16le(ip);
    ip += 2;
  have_dist:
    if (op - wbase < (std::ptrdiff_t)dist) return TPULZ4_E_MALFORMED;

    {
      int match_len = token & ML_MASK;
      if (match_len == ML_MASK) {
        int b = 0xFF;
        while (ip < iend) {
          b = *ip++;
          if (b != 0xFF) break;
          match_len += 0xFF;
          if (match_len >= 0x7E000000) return TPULZ4_E_MALFORMED;
        }
        match_len += b;
      }
      match_len += MIN_MATCH;

      if (op + match_len > oend) return TPULZ4_E_MALFORMED;
      if (dist != 0) {
        match_copy(dest, (int)(op - dest) - (int)dist, (int)(op - dest),
                   (int)dist, match_len, dest_len);
      } else {
        // null match offset: must not throw or loop (the reference pins
        // only that, LZ4Test.java:350-361); this framework defines the
        // bytes as zeros in every tier so malformed-input output is
        // deterministic and never exposes shortcut-copy slop or stale
        // dest contents
        std::memset(op, 0, (size_t)match_len);
      }
      op += match_len;
    }
  }
  return (int)(op - dest);
}

TPULZ4_API int tpulz4_decompress_safe(const uint8_t* src, int src_len,
                                      uint8_t* dest, int dest_len) {
  return decompress_safe_impl(src, src_len, dest, dest_len, 0);
}

// decode-only linked-block support (r4 verdict next #8): `hist_len` valid
// bytes are readable immediately before `dest` and matches may reference
// them. The reference refuses dependent frames on both sides
// (LZ4FrameOutputStream.java:361-363); this reads what the lz4 CLI's -BD
// produces while the writer keeps parity (never emits dependent frames).
TPULZ4_API int tpulz4_decompress_safe_ext(const uint8_t* src, int src_len,
                                          uint8_t* dest, int dest_len,
                                          int hist_len) {
  return decompress_safe_impl(src, src_len, dest, dest_len, hist_len);
}

TPULZ4_API int tpulz4_decompress_fast(const uint8_t* src, int src_avail,
                                      uint8_t* dest, int dest_len) {
  if (src_avail <= 0 || dest_len < 0) return TPULZ4_E_PARAM;
  if (dest_len == 0) {
    if (src[0] != 0) return TPULZ4_E_MALFORMED;
    return 1;
  }

  // pointer-based hot loop; see tpulz4_decompress_safe for the
  // split-shortcut and envelope derivations
  const uint8_t* ip = src;
  const uint8_t* const iend = src + src_avail;
  uint8_t* op = dest;
  uint8_t* const oend = dest + dest_len;
  const uint8_t* const ishort = iend - 16;
  uint8_t* const oshort = oend - 32;

  for (;;) {
    if (ip >= iend) return TPULZ4_E_MALFORMED;
    unsigned token = *ip++;
    int literal_len = token >> ML_BITS;
    unsigned dist;

    if (__builtin_expect(literal_len != RUN_MASK && ip <= ishort &&
                         op <= oshort, 1)) {
      std::memcpy(op, ip, 16);
      ip += literal_len;
      op += literal_len;
      dist = read16le(ip);
      ip += 2;
      unsigned mlf = token & ML_MASK;
      if (__builtin_expect(mlf != ML_MASK && dist >= 8, 1)) {
        const uint8_t* match = op - dist;
        if (match < dest) return TPULZ4_E_MALFORMED;
        std::memcpy(op, match, 8);
        std::memcpy(op + 8, match + 8, 8);
        std::memcpy(op + 16, match + 16, 2);
        op += mlf + MIN_MATCH;
        continue;
      }
      goto have_dist;  // long or overlapping match: guarded path
    }

    if (literal_len == RUN_MASK) {
      for (;;) {
        if (ip >= iend) return TPULZ4_E_MALFORMED;
        int b = *ip++;
        if (b != 0xFF) { literal_len += b; break; }
        literal_len += 0xFF;
        if (literal_len >= 0x7E000000) return TPULZ4_E_MALFORMED;
      }
    }

    {
      uint8_t* lit_end = op + literal_len;
      if (lit_end > oend - COPY_LENGTH) {
        if (lit_end != oend) return TPULZ4_E_MALFORMED;
        if (ip + literal_len > iend) return TPULZ4_E_MALFORMED;
        std::memcpy(op, ip, literal_len);
        ip += literal_len;
        op = lit_end;
        break;  // EOF
      }
      if (ip + literal_len + 2 > iend) return TPULZ4_E_MALFORMED;
      if (literal_len > 0 && lit_end + 16 <= oend &&
          ip + literal_len + 16 <= iend) {
        wild_copy16(op, ip, literal_len);
      } else {
        std::memcpy(op, ip, literal_len);
      }
      ip += literal_len;
      op = lit_end;
    }

    dist = read16le(ip);
    ip += 2;
  have_dist:
    if (op - dest < (std::ptrdiff_t)dist) return TPULZ4_E_MALFORMED;

    {
      int match_len = token & ML_MASK;
      if (match_len == ML_MASK) {
        for (;;) {
          if (ip >= iend) return TPULZ4_E_MALFORMED;
          int b = *ip++;
          if (b != 0xFF) { match_len += b; break; }
          match_len += 0xFF;
          if (match_len >= 0x7E000000) return TPULZ4_E_MALFORMED;
        }
      }
      match_len += MIN_MATCH;

      if (op + match_len > oend) return TPULZ4_E_MALFORMED;
      if (dist != 0) {
        match_copy(dest, (int)(op - dest) - (int)dist, (int)(op - dest),
                   (int)dist, match_len, dest_len);
      } else {
        // null match offset: must not throw or loop (the reference pins
        // only that, LZ4Test.java:350-361); this framework defines the
        // bytes as zeros in every tier so malformed-input output is
        // deterministic and never exposes shortcut-copy slop or stale
        // dest contents
        std::memset(op, 0, (size_t)match_len);
      }
      op += match_len;
    }
  }
  return (int)(ip - src);
}

// ---------------------------------------------------------------------------
// xxHash32 / xxHash64 (one-shot + streaming)
// ---------------------------------------------------------------------------

namespace xx {

constexpr uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                   P4 = 668265263u, P5 = 374761393u;
constexpr uint64_t Q1 = 11400714785074694791ull, Q2 = 14029467366897019727ull,
                   Q3 = 1609587929392839161ull, Q4 = 9650029242287828579ull,
                   Q5 = 2870177450012600261ull;

inline uint32_t rotl32(uint32_t v, int n) { return (v << n) | (v >> (32 - n)); }
inline uint64_t rotl64(uint64_t v, int n) { return (v << n) | (v >> (64 - n)); }
inline uint32_t round32(uint32_t v, uint32_t x) { return rotl32(v + x * P2, 13) * P1; }
inline uint64_t round64(uint64_t v, uint64_t x) { return rotl64(v + x * Q2, 31) * Q1; }

inline uint32_t avalanche32(uint32_t h) {
  h ^= h >> 15; h *= P2; h ^= h >> 13; h *= P3; h ^= h >> 16;
  return h;
}

inline uint64_t avalanche64(uint64_t h) {
  h ^= h >> 33; h *= Q2; h ^= h >> 29; h *= Q3; h ^= h >> 32;
  return h;
}

inline uint32_t tail32(uint32_t h, const uint8_t* p, const uint8_t* end) {
  while (p + 4 <= end) { h += read32(p) * P3; h = rotl32(h, 17) * P4; p += 4; }
  while (p < end) { h += (*p++) * P5; h = rotl32(h, 11) * P1; }
  return avalanche32(h);
}

inline uint64_t tail64(uint64_t h, const uint8_t* p, const uint8_t* end) {
  while (p + 8 <= end) {
    h ^= round64(0, read64(p));
    h = rotl64(h, 27) * Q1 + Q4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= (uint64_t)read32(p) * Q1;
    h = rotl64(h, 23) * Q2 + Q3;
    p += 4;
  }
  while (p < end) { h ^= (*p++) * Q5; h = rotl64(h, 11) * Q1; }
  return avalanche64(h);
}

// The 4-lane stripe recurrence must stay FOUR INDEPENDENT SCALAR chains:
// with the lanes adjacent in memory GCC auto-vectorizes them into a single
// xmm dependency chain (two vpmulld per stripe, latency ~10 each on this
// Xeon class), which measures ~1.5x SLOWER than the pipelined scalar form
// (3.7 vs 5.6 GB/s). noinline keeps the caller's vectorizer away too.
__attribute__((noinline, optimize("no-tree-vectorize")))
static const uint8_t* stripes32(uint32_t v[4], const uint8_t* p,
                                const uint8_t* limit) {
  uint32_t v1 = v[0], v2 = v[1], v3 = v[2], v4 = v[3];
  do {
    v1 = round32(v1, read32(p)); p += 4;
    v2 = round32(v2, read32(p)); p += 4;
    v3 = round32(v3, read32(p)); p += 4;
    v4 = round32(v4, read32(p)); p += 4;
  } while (p <= limit);
  v[0] = v1; v[1] = v2; v[2] = v3; v[3] = v4;
  return p;
}

__attribute__((noinline, optimize("no-tree-vectorize")))
static const uint8_t* stripes64(uint64_t v[4], const uint8_t* p,
                                const uint8_t* limit) {
  uint64_t v1 = v[0], v2 = v[1], v3 = v[2], v4 = v[3];
  do {
    v1 = round64(v1, read64(p)); p += 8;
    v2 = round64(v2, read64(p)); p += 8;
    v3 = round64(v3, read64(p)); p += 8;
    v4 = round64(v4, read64(p)); p += 8;
  } while (p <= limit);
  v[0] = v1; v[1] = v2; v[2] = v3; v[3] = v4;
  return p;
}

}  // namespace xx

TPULZ4_API uint32_t tpulz4_xxh32(const uint8_t* buf, int64_t len, uint32_t seed) {
  using namespace xx;
  const uint8_t* p = buf;
  const uint8_t* end = buf + len;
  uint32_t h;
  if (len >= 16) {
    uint32_t v[4] = {seed + P1 + P2, seed + P2, seed, seed - P1};
    p = stripes32(v, p, end - 16);
    h = rotl32(v[0], 1) + rotl32(v[1], 7) + rotl32(v[2], 12) + rotl32(v[3], 18);
  } else {
    h = seed + P5;
  }
  h += (uint32_t)len;
  return tail32(h, p, end);
}

TPULZ4_API uint64_t tpulz4_xxh64(const uint8_t* buf, int64_t len, uint64_t seed) {
  using namespace xx;
  const uint8_t* p = buf;
  const uint8_t* end = buf + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v[4] = {seed + Q1 + Q2, seed + Q2, seed, seed - Q1};
    p = stripes64(v, p, end - 32);
    h = rotl64(v[0], 1) + rotl64(v[1], 7) + rotl64(v[2], 12) + rotl64(v[3], 18);
    h ^= round64(0, v[0]); h = h * Q1 + Q4;
    h ^= round64(0, v[1]); h = h * Q1 + Q4;
    h ^= round64(0, v[2]); h = h * Q1 + Q4;
    h ^= round64(0, v[3]); h = h * Q1 + Q4;
  } else {
    h = seed + Q5;
  }
  h += (uint64_t)len;
  return tail64(h, p, end);
}

// streaming state (handle-based, mirroring the JNI streaming lifecycle:
// XXHashJNI.c:89-150 — malloc'd state behind an opaque pointer)
struct XXH32State {
  uint32_t v1, v2, v3, v4;
  uint8_t memory[16];
  int mem_size;
  uint64_t total_len;
  uint32_t seed;
};

struct XXH64State {
  uint64_t v1, v2, v3, v4;
  uint8_t memory[32];
  int mem_size;
  uint64_t total_len;
  uint64_t seed;
};

TPULZ4_API void* tpulz4_xxh32_create(uint32_t seed) {
  using namespace xx;
  auto* st = new XXH32State();
  st->seed = seed;
  st->v1 = seed + P1 + P2; st->v2 = seed + P2; st->v3 = seed; st->v4 = seed - P1;
  st->mem_size = 0;
  st->total_len = 0;
  return st;
}

TPULZ4_API void tpulz4_xxh32_reset(void* handle) {
  using namespace xx;
  auto* st = (XXH32State*)handle;
  uint32_t seed = st->seed;
  st->v1 = seed + P1 + P2; st->v2 = seed + P2; st->v3 = seed; st->v4 = seed - P1;
  st->mem_size = 0;
  st->total_len = 0;
}

TPULZ4_API void tpulz4_xxh32_update(void* handle, const uint8_t* buf, int64_t len) {
  using namespace xx;
  auto* st = (XXH32State*)handle;
  st->total_len += (uint64_t)len;
  const uint8_t* p = buf;
  const uint8_t* end = buf + len;

  if (st->mem_size + len < 16) {
    std::memcpy(st->memory + st->mem_size, p, (size_t)len);
    st->mem_size += (int)len;
    return;
  }
  if (st->mem_size > 0) {
    int take = 16 - st->mem_size;
    std::memcpy(st->memory + st->mem_size, p, take);
    st->v1 = round32(st->v1, read32(st->memory));
    st->v2 = round32(st->v2, read32(st->memory + 4));
    st->v3 = round32(st->v3, read32(st->memory + 8));
    st->v4 = round32(st->v4, read32(st->memory + 12));
    p += take;
    st->mem_size = 0;
  }
  if (p + 16 <= end) {
    uint32_t v[4] = {st->v1, st->v2, st->v3, st->v4};
    p = stripes32(v, p, end - 16);
    st->v1 = v[0]; st->v2 = v[1]; st->v3 = v[2]; st->v4 = v[3];
  }
  if (p < end) {
    std::memcpy(st->memory, p, end - p);
    st->mem_size = (int)(end - p);
  }
}

TPULZ4_API uint32_t tpulz4_xxh32_digest(void* handle) {
  using namespace xx;
  auto* st = (XXH32State*)handle;
  uint32_t h;
  if (st->total_len >= 16) {
    h = rotl32(st->v1, 1) + rotl32(st->v2, 7) + rotl32(st->v3, 12) + rotl32(st->v4, 18);
  } else {
    h = st->seed + P5;
  }
  h += (uint32_t)st->total_len;
  return tail32(h, st->memory, st->memory + st->mem_size);
}

TPULZ4_API void tpulz4_xxh32_free(void* handle) { delete (XXH32State*)handle; }

TPULZ4_API void* tpulz4_xxh64_create(uint64_t seed) {
  using namespace xx;
  auto* st = new XXH64State();
  st->seed = seed;
  st->v1 = seed + Q1 + Q2; st->v2 = seed + Q2; st->v3 = seed; st->v4 = seed - Q1;
  st->mem_size = 0;
  st->total_len = 0;
  return st;
}

TPULZ4_API void tpulz4_xxh64_reset(void* handle) {
  using namespace xx;
  auto* st = (XXH64State*)handle;
  uint64_t seed = st->seed;
  st->v1 = seed + Q1 + Q2; st->v2 = seed + Q2; st->v3 = seed; st->v4 = seed - Q1;
  st->mem_size = 0;
  st->total_len = 0;
}

TPULZ4_API void tpulz4_xxh64_update(void* handle, const uint8_t* buf, int64_t len) {
  using namespace xx;
  auto* st = (XXH64State*)handle;
  st->total_len += (uint64_t)len;
  const uint8_t* p = buf;
  const uint8_t* end = buf + len;

  if (st->mem_size + len < 32) {
    std::memcpy(st->memory + st->mem_size, p, (size_t)len);
    st->mem_size += (int)len;
    return;
  }
  if (st->mem_size > 0) {
    int take = 32 - st->mem_size;
    std::memcpy(st->memory + st->mem_size, p, take);
    st->v1 = round64(st->v1, read64(st->memory));
    st->v2 = round64(st->v2, read64(st->memory + 8));
    st->v3 = round64(st->v3, read64(st->memory + 16));
    st->v4 = round64(st->v4, read64(st->memory + 24));
    p += take;
    st->mem_size = 0;
  }
  if (p + 32 <= end) {
    uint64_t v[4] = {st->v1, st->v2, st->v3, st->v4};
    p = stripes64(v, p, end - 32);
    st->v1 = v[0]; st->v2 = v[1]; st->v3 = v[2]; st->v4 = v[3];
  }
  if (p < end) {
    std::memcpy(st->memory, p, end - p);
    st->mem_size = (int)(end - p);
  }
}

TPULZ4_API uint64_t tpulz4_xxh64_digest(void* handle) {
  using namespace xx;
  auto* st = (XXH64State*)handle;
  uint64_t h;
  if (st->total_len >= 32) {
    h = rotl64(st->v1, 1) + rotl64(st->v2, 7) + rotl64(st->v3, 12) + rotl64(st->v4, 18);
    h ^= round64(0, st->v1); h = h * Q1 + Q4;
    h ^= round64(0, st->v2); h = h * Q1 + Q4;
    h ^= round64(0, st->v3); h = h * Q1 + Q4;
    h ^= round64(0, st->v4); h = h * Q1 + Q4;
  } else {
    h = st->seed + Q5;
  }
  h += st->total_len;
  return tail64(h, st->memory, st->memory + st->mem_size);
}

TPULZ4_API void tpulz4_xxh64_free(void* handle) { delete (XXH64State*)handle; }

// ---------------------------------------------------------------------------
// batched/parallel entry points (host-side data-plane: many independent
// blocks, the same block-parallel decomposition the TPU tier uses)
// ---------------------------------------------------------------------------

// Work-stealing loop shared by every batched/container entry point: indices
// come from a shared counter so per-block cost imbalance (content-dependent
// codec time, threads that also advance a serial in-order frontier)
// self-balances, the calling thread participates, and each thread runs
// `finish()` before exiting so threads that run out of blocks keep draining
// any residual serial frontier instead of leaving it to the last one.
template <typename F, typename G>
static void parallel_for_dynamic(int n, int n_threads, F f, G finish) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) f(i);
    finish();
    return;
  }
  std::atomic<int> next{0};
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n) break;
      f(i);
    }
    finish();
  };
  std::vector<std::thread> ts;
  ts.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) ts.emplace_back(worker);
  worker();
  for (auto& th : ts) th.join();
}

template <typename F>
static void parallel_for_dynamic(int n, int n_threads, F f) {
  parallel_for_dynamic(n, n_threads, f, [] {});
}

TPULZ4_API void tpulz4_compress_fast_batch(
    const uint8_t* src, const int64_t* src_offsets, const int32_t* src_lens,
    uint8_t* dest, const int64_t* dest_offsets, int32_t max_dest_len_each,
    int32_t* out_lens, int32_t n_blocks, int32_t n_threads) {
  parallel_for_dynamic(n_blocks, n_threads, [&](int i) {
    out_lens[i] = tpulz4_compress_fast(src + src_offsets[i], src_lens[i],
                                       dest + dest_offsets[i],
                                       max_dest_len_each);
  });
}

TPULZ4_API void tpulz4_compress_turbo_batch(
    const uint8_t* src, const int64_t* src_offsets, const int32_t* src_lens,
    uint8_t* dest, const int64_t* dest_offsets, int32_t max_dest_len_each,
    int32_t* out_lens, int32_t n_blocks, int32_t n_threads) {
  parallel_for_dynamic(n_blocks, n_threads, [&](int i) {
    out_lens[i] = tpulz4_compress_turbo(src + src_offsets[i], src_lens[i],
                                        dest + dest_offsets[i],
                                        max_dest_len_each);
  });
}

TPULZ4_API void tpulz4_compress_hc_batch(
    const uint8_t* src, const int64_t* src_offsets, const int32_t* src_lens,
    uint8_t* dest, const int64_t* dest_offsets, int32_t max_dest_len_each,
    int32_t* out_lens, int32_t n_blocks, int32_t n_threads, int32_t level) {
  parallel_for_dynamic(n_blocks, n_threads, [&](int i) {
    out_lens[i] = tpulz4_compress_hc(src + src_offsets[i], src_lens[i],
                                     dest + dest_offsets[i],
                                     max_dest_len_each, level);
  });
}

TPULZ4_API void tpulz4_decompress_safe_batch(
    const uint8_t* src, const int64_t* src_offsets, const int32_t* src_lens,
    uint8_t* dest, const int64_t* dest_offsets, int32_t max_dest_len_each,
    int32_t* out_lens, int32_t n_blocks, int32_t n_threads) {
  parallel_for_dynamic(n_blocks, n_threads, [&](int i) {
    out_lens[i] = tpulz4_decompress_safe(src + src_offsets[i], src_lens[i],
                                         dest + dest_offsets[i],
                                         max_dest_len_each);
  });
}


// ---------------------------------------------------------------------------
// sequence parser (for the gather-decode TPU pipeline)
// ---------------------------------------------------------------------------
//
// Walks the token stream without copying data, emitting one record per
// sequence: absolute literal source/destination offsets and lengths plus
// match distance/length. The device side turns these into per-byte gather
// maps (kernels/gather_decode.py). Validation matches tpulz4_decompress_safe.

TPULZ4_API int tpulz4_parse_sequences(
    const uint8_t* src, int src_len, int max_seq,
    int32_t* lit_out, int32_t* lit_src, int32_t* lit_len_a,
    int32_t* m_out, int32_t* m_dist, int32_t* m_len_a,
    int32_t* out_total) {
  if (src_len < 0) return TPULZ4_E_PARAM;
  int s = 0, d = 0, n = 0;
  const int src_end = src_len;
  for (;;) {
    if (s >= src_end) return TPULZ4_E_MALFORMED;
    if (n >= max_seq) return TPULZ4_E_PARAM;
    int token = src[s++];

    int lit_len = token >> ML_BITS;
    if (lit_len == RUN_MASK) {
      int b = 0xFF;
      while (s < src_end) {
        b = src[s++];
        if (b != 0xFF) break;
        lit_len += 0xFF;
        if (lit_len >= 0x7E000000) return TPULZ4_E_MALFORMED;
      }
      lit_len += b;
    }
    if (s + lit_len > src_end) return TPULZ4_E_MALFORMED;

    lit_out[n] = d;
    lit_src[n] = s;
    lit_len_a[n] = lit_len;
    s += lit_len;
    d += lit_len;

    if (s == src_end) {  // EOF: final literals-only sequence
      m_out[n] = d;
      m_dist[n] = 0;
      m_len_a[n] = 0;
      ++n;
      break;
    }
    if (s + 2 > src_end) return TPULZ4_E_MALFORMED;

    int match_dec = src[s] | (src[s + 1] << 8);
    s += 2;
    if (d - match_dec < 0) return TPULZ4_E_MALFORMED;

    int match_len = token & ML_MASK;
    if (match_len == ML_MASK) {
      int b = 0xFF;
      while (s < src_end) {
        b = src[s++];
        if (b != 0xFF) break;
        match_len += 0xFF;
        if (match_len >= 0x7E000000) return TPULZ4_E_MALFORMED;
      }
      match_len += b;
    }
    match_len += MIN_MATCH;
    if (match_dec == 0) {
      // null-offset self-copy: contributes no new bytes; keep output
      // identical to the serial decoders by treating it as zero-length
      // (the bytes it "writes" are the bytes already there)
      m_out[n] = d;
      m_dist[n] = 0;
      m_len_a[n] = 0;
      ++n;
      d += match_len;  // serial decoders advance over existing bytes
      continue;
    }

    m_out[n] = d;
    m_dist[n] = match_dec;
    m_len_a[n] = match_len;
    d += match_len;
    ++n;
  }
  *out_total = d;
  return n;
}

// Batched multithreaded parse: block i's tables land at row i * max_seq of
// each packed array; returns per-block sequence counts in n_seq_out (negative
// = error code) and decompressed totals in total_out. One call replaces the
// per-block ctypes round-trips (the parse feeds the device decode pipelines,
// so its host cost must stay far below the device copy rate).
// tail_mode: 0 = leave table tails untouched (caller pre-initialized),
// 1 = zero the length tails only (segment-executor no-ops),
// 2 = additionally set lit_out/m_out tails to 1<<30 so searchsorted never
//     selects them (gather pipeline sentinel)
TPULZ4_API void tpulz4_parse_sequences_batch(
    const uint8_t* src, const int64_t* src_offsets, const int32_t* src_lens,
    int32_t max_seq,
    int32_t* lit_out, int32_t* lit_src, int32_t* lit_len,
    int32_t* m_out, int32_t* m_dist, int32_t* m_len,
    int32_t* n_seq_out, int32_t* total_out,
    int32_t n_blocks, int32_t n_threads, int32_t tail_mode) {
  parallel_for_dynamic(n_blocks, n_threads, [&](int i) {
    int64_t row = (int64_t)i * max_seq;
    int32_t total = 0;
    int r = tpulz4_parse_sequences(
        src + src_offsets[i], src_lens[i], max_seq,
        lit_out + row, lit_src + row, lit_len + row,
        m_out + row, m_dist + row, m_len + row, &total);
    n_seq_out[i] = r;
    total_out[i] = total;
    if (r >= 0 && tail_mode > 0) {
      size_t tail = (size_t)(max_seq - r) * sizeof(int32_t);
      std::memset(lit_len + row + r, 0, tail);
      std::memset(m_len + row + r, 0, tail);
      std::memset(lit_src + row + r, 0, tail);
      std::memset(m_dist + row + r, 0, tail);
      if (tail_mode > 1) {
        constexpr int32_t kSentinel = 1 << 30;
        for (int j = r; j < max_seq; ++j) {
          lit_out[row + j] = kSentinel;
          m_out[row + j] = kSentinel;
        }
      } else {
        std::memset(lit_out + row + r, 0, tail);
        std::memset(m_out + row + r, 0, tail);
      }
    }
  });
}

// ---------------------------------------------------------------------------
// one-shot LZ4 Frame codec (native runtime: header assembly, multithreaded
// block codec, checksums and validation in a single call)
// ---------------------------------------------------------------------------
//
// Byte-compatible with formats/frame.py and the reference stream classes
// (LZ4FrameOutputStream.java:50-120,177-306, LZ4FrameInputStream.java:132-345).
// flags bits below mirror the FLG bit positions minus fixed version/indep.

constexpr int TPULZ4_E_FRAME = -4;
constexpr int TPULZ4_E_CHECKSUM = -5;
// header-validation sub-codes (the Python layer maps these to the same
// error messages the pure-Python reader raises, which tests pin)
constexpr int TPULZ4_E_FRAME_VERSION = -6;
constexpr int TPULZ4_E_FRAME_DEPENDENT = -7;
constexpr int TPULZ4_E_FRAME_RESERVED = -8;
constexpr int TPULZ4_E_FRAME_BLOCKSIZE = -9;
constexpr int TPULZ4_E_FRAME_BLOCK_TOO_BIG = -10;
constexpr int TPULZ4_E_FRAME_DICTID = -11;  // FLG bit 0 (DictID, spec v1.6+)

constexpr uint32_t FRAME_MAGIC = 0x184D2204u;
constexpr uint32_t FRAME_MAGIC_SKIPPABLE = 0x184D2A50u;
constexpr uint32_t FRAME_INCOMPRESSIBLE = 0x80000000u;
constexpr int TPULZ4F_CONTENT_CHECKSUM = 1;
constexpr int TPULZ4F_BLOCK_CHECKSUM = 2;
constexpr int TPULZ4F_CONTENT_SIZE = 4;

namespace frame {

inline void write_u32(uint8_t* p, uint32_t v) { std::memcpy(p, &v, 4); }
inline uint32_t read_u32(const uint8_t* p) { uint32_t v; std::memcpy(&v, p, 4); return v; }

// Reusable scratch arena. The container compressors need ~1.2x the input
// size of scratch; a fresh allocation that big is served by mmap, so every
// call pays kernel page-zeroing + first-touch faults — a measurable slice
// of a whole container compress. Keep the largest buffer alive and hand it
// out under a try-lock; concurrent callers simply take a private
// allocation.
class ScratchLease {
 public:
  explicit ScratchLease(size_t size) {
    if (mu().try_lock()) {
      uint8_t*& buf = cached();
      size_t& cap = cached_cap();
      if (cap < size) {
        std::free(buf);
        buf = static_cast<uint8_t*>(std::malloc(size));
        cap = buf ? size : 0;
      }
      if (buf) {
        p_ = buf;
        leased_ = true;
        return;
      }
      mu().unlock();
    }
    p_ = static_cast<uint8_t*>(std::malloc(size));
    leased_ = false;
  }
  ~ScratchLease() {
    if (leased_) mu().unlock();
    else std::free(p_);
  }
  uint8_t* get() const { return p_; }
  static void release_cache() {
    std::lock_guard<std::mutex> g(mu());
    std::free(cached());
    cached() = nullptr;
    cached_cap() = 0;
  }

 private:
  static std::mutex& mu() { static std::mutex m; return m; }
  static uint8_t*& cached() { static uint8_t* b = nullptr; return b; }
  static size_t& cached_cap() { static size_t c = 0; return c; }
  uint8_t* p_;
  bool leased_;
};

struct Blk { int64_t off; int32_t len; bool compressed; uint32_t bsum; };

// Serial linked-block ("dependent", CLI -BD) frame-body decode: each block
// may reference up to 64KB of the frame's previously decoded output, so
// blocks decode in order, contiguously, through the history-extended block
// decoder. Decode-only and opt-in — the writer keeps reference parity and
// never emits dependent frames (LZ4FrameOutputStream.java:361-363).
// Returns the frame's decoded length or a negative error.
static int64_t decode_dependent(const uint8_t* src,
                                const std::vector<Blk>& blocks, int64_t bs,
                                bool has_bsum, uint8_t* dest,
                                int64_t frame_dest, int64_t dest_cap) {
  int64_t w = frame_dest;
  for (const Blk& b : blocks) {
    const uint8_t* p = src + b.off;
    if (has_bsum && tpulz4_xxh32(p, b.len, 0) != b.bsum)
      return TPULZ4_E_CHECKSUM;
    int64_t room = dest_cap - w;
    int out_max = (int)(room < bs ? (room < 0 ? 0 : room) : bs);
    int64_t seen = w - frame_dest;
    int hist = (int)(seen < MAX_DISTANCE ? seen : MAX_DISTANCE);
    int out_len;
    if (b.compressed) {
      int r = tpulz4_decompress_safe_ext(p, b.len, dest + w, out_max, hist);
      if (r < 0) {
        // full-bs slot: any overflow means the block decodes past the
        // frame's max block size — a spec violation, NOT a dest-size
        // problem (reporting DEST_TOO_SMALL here made the caller's
        // grow-retry loop unbounded on malicious input — r5 review #1)
        if (out_max >= bs)
          return r == TPULZ4_E_DEST_TOO_SMALL ? TPULZ4_E_MALFORMED : r;
        // clamped slot: failures (including a match crossing the clamped
        // end reading as malformed) may just need room
        return (r == TPULZ4_E_MALFORMED || r == TPULZ4_E_DEST_TOO_SMALL)
                   ? TPULZ4_E_DEST_TOO_SMALL : r;
      }
      out_len = r;
    } else {
      if (b.len > out_max) return TPULZ4_E_DEST_TOO_SMALL;
      std::memcpy(dest + w, p, b.len);
      out_len = b.len;
    }
    w += out_len;
  }
  return w - frame_dest;
}

}  // namespace frame

TPULZ4_API int64_t tpulz4_frame_compress_bound(int64_t raw_len,
                                               int32_t block_size_id) {
  if (block_size_id < 4 || block_size_id > 7 || raw_len < 0) return TPULZ4_E_PARAM;
  int64_t bs = (int64_t)1 << (2 * block_size_id + 8);
  int64_t n = raw_len ? (raw_len + bs - 1) / bs : 0;
  int64_t per_block = 4 + tpulz4_max_compressed_length((int)bs) + 4;
  return 15 + n * per_block + 8;
}

// Compress `raw` into one complete LZ4 frame. level 0 = fast scan,
// 1..17 = HC. Returns frame length or a negative error code.
TPULZ4_API int64_t tpulz4_frame_compress(
    const uint8_t* raw, int64_t raw_len, int32_t block_size_id,
    int32_t flags, int32_t level, uint8_t* dest, int64_t dest_cap,
    int32_t n_threads) {
  if (block_size_id < 4 || block_size_id > 7 || raw_len < 0)
    return TPULZ4_E_PARAM;
  if (dest_cap < tpulz4_frame_compress_bound(raw_len, block_size_id))
    return TPULZ4_E_DEST_TOO_SMALL;
  const int64_t bs = (int64_t)1 << (2 * block_size_id + 8);
  const int n = raw_len ? (int)((raw_len + bs - 1) / bs) : 0;
  const int cap = tpulz4_max_compressed_length((int)bs);

  // header
  int64_t d = 0;
  frame::write_u32(dest + d, FRAME_MAGIC);
  d += 4;
  int64_t desc_off = d;
  uint8_t flg = (1 << 6) | (1 << 5);  // version 1, block independence
  if (flags & TPULZ4F_CONTENT_CHECKSUM) flg |= 1 << 2;
  if (flags & TPULZ4F_CONTENT_SIZE) flg |= 1 << 3;
  if (flags & TPULZ4F_BLOCK_CHECKSUM) flg |= 1 << 4;
  dest[d++] = flg;
  dest[d++] = (uint8_t)(block_size_id << 4);
  if (flags & TPULZ4F_CONTENT_SIZE) {
    uint64_t sz = (uint64_t)raw_len;
    std::memcpy(dest + d, &sz, 8);
    d += 8;
  }
  dest[d] = (uint8_t)(tpulz4_xxh32(dest + desc_off, d - desc_off, 0) >> 8);
  ++d;

  // parallel block compress into scratch (per-block stride = cap), with
  // emission and the content checksum folded into the compress threads:
  // after finishing a block, a thread tries to advance a shared in-order
  // frontier that copies completed blocks into dest and hashes the raw
  // input — so the old serial memcpy/hash tail runs concurrently with the
  // remaining compression, cache-warm. Per-block checksums need no order
  // and are computed on the thread that compressed the block.
  frame::ScratchLease scratch((size_t)n * cap);
  if (n > 0 && scratch.get() == nullptr) return TPULZ4_E_PARAM;
  std::vector<int32_t> clens(n);
  std::vector<uint32_t> bsums(flags & TPULZ4F_BLOCK_CHECKSUM ? n : 0);
  std::unique_ptr<std::atomic<int>[]> done(new std::atomic<int>[n ? n : 1]);
  for (int i = 0; i < n; ++i) done[i].store(0, std::memory_order_relaxed);
  std::atomic<int> emit_next{0};
  std::atomic_flag emit_busy = ATOMIC_FLAG_INIT;
  std::atomic<bool> had_error{false};
  void* hstate = (flags & TPULZ4F_CONTENT_CHECKSUM) ? tpulz4_xxh32_create(0)
                                                    : nullptr;
  int64_t demit = d;  // mutated only while holding emit_busy / after join

  auto emit_block = [&](int j) {
    int64_t off = (int64_t)j * bs;
    int raw_block = (int)(raw_len - off < bs ? raw_len - off : bs);
    const uint8_t* payload;
    uint32_t word;
    int plen;
    if (clens[j] >= raw_block) {  // incompressible: store raw
      payload = raw + off;
      plen = raw_block;
      word = (uint32_t)raw_block | FRAME_INCOMPRESSIBLE;
    } else {
      payload = scratch.get() + (size_t)j * cap;
      plen = clens[j];
      word = (uint32_t)plen;
    }
    frame::write_u32(dest + demit, word);
    demit += 4;
    std::memcpy(dest + demit, payload, plen);
    demit += plen;
    if (flags & TPULZ4F_BLOCK_CHECKSUM) {
      frame::write_u32(dest + demit, bsums[j]);
      demit += 4;
    }
    if (hstate) tpulz4_xxh32_update(hstate, raw + off, raw_block);
  };
  auto advance_emit = [&] {
    if (emit_busy.test_and_set(std::memory_order_acquire)) return;
    int j = emit_next.load(std::memory_order_relaxed);
    while (j < n && done[j].load(std::memory_order_acquire) == 1) {
      emit_block(j);
      ++j;
    }
    emit_next.store(j, std::memory_order_relaxed);
    emit_busy.clear(std::memory_order_release);
  };

  parallel_for_dynamic(n, n_threads, [&](int i) {
    int64_t off = (int64_t)i * bs;
    int len = (int)(raw_len - off < bs ? raw_len - off : bs);
    uint8_t* out = scratch.get() + (size_t)i * cap;
    clens[i] = level == -1 ? tpulz4_compress_turbo(raw + off, len, out, cap)
               : level <= 0 ? tpulz4_compress_fast(raw + off, len, out, cap)
                            : tpulz4_compress_hc(raw + off, len, out, cap, level);
    if (clens[i] < 0) {
      had_error.store(true, std::memory_order_relaxed);
      done[i].store(2, std::memory_order_release);
      return;
    }
    if (flags & TPULZ4F_BLOCK_CHECKSUM) {
      const bool stored_raw = clens[i] >= len;
      bsums[i] = stored_raw ? tpulz4_xxh32(raw + off, len, 0)
                            : tpulz4_xxh32(out, clens[i], 0);
    }
    done[i].store(1, std::memory_order_release);
    if (!had_error.load(std::memory_order_relaxed)) advance_emit();
  }, [&] {
    // out of blocks: keep draining the emit/hash frontier cooperatively
    while (!had_error.load(std::memory_order_relaxed) &&
           emit_next.load(std::memory_order_acquire) < n) {
      advance_emit();
      std::this_thread::yield();
    }
  });
  if (had_error.load(std::memory_order_relaxed)) {
    if (hstate) tpulz4_xxh32_free(hstate);
    for (int i = 0; i < n; ++i)
      if (clens[i] < 0) return clens[i];
  }
  for (int j = emit_next.load(std::memory_order_relaxed); j < n; ++j)
    emit_block(j);  // drain whatever the parallel phase did not reach
  d = demit;

  frame::write_u32(dest + d, 0);  // end mark
  d += 4;
  if (flags & TPULZ4F_CONTENT_CHECKSUM) {
    frame::write_u32(dest + d, tpulz4_xxh32_digest(hstate));
    tpulz4_xxh32_free(hstate);
    d += 4;
  }
  return d;
}

// Release the cached compress scratch arena (tests / memory-sensitive
// hosts; safe to call at any time).
TPULZ4_API void tpulz4_release_scratch() { frame::ScratchLease::release_cache(); }

// Decompress one or more concatenated LZ4 frames (skippable frames are
// skipped). Returns total decompressed length or a negative error;
// *consumed_out reports source bytes eaten. single_frame stops after the
// first complete data frame (LZ4FrameInputStream.java:416-445 semantics).
TPULZ4_API int64_t tpulz4_frame_decompress(
    const uint8_t* src, int64_t src_len, uint8_t* dest, int64_t dest_cap,
    int32_t n_threads, int32_t single_frame, int32_t allow_dependent,
    int64_t* consumed_out) {
  int64_t s = 0, d = 0;
  bool first = true;
  while (s < src_len) {
    if (s + 4 > src_len) {
      if (first) return TPULZ4_E_FRAME;
      break;
    }
    uint32_t magic = frame::read_u32(src + s);
    if ((magic & 0xFFFFFFF0u) == FRAME_MAGIC_SKIPPABLE) {
      if (s + 8 > src_len) return TPULZ4_E_FRAME;
      uint32_t skip = frame::read_u32(src + s + 4);
      if (s + 8 + (int64_t)skip > src_len) return TPULZ4_E_FRAME;
      s += 8 + skip;
      first = false;
      continue;
    }
    if (magic != FRAME_MAGIC) {
      if (first) return TPULZ4_E_FRAME;
      break;  // trailing garbage after at least one frame: stop cleanly
    }
    s += 4;
    first = false;

    // descriptor
    int64_t desc_off = s;
    if (s + 2 > src_len) return TPULZ4_E_FRAME;
    uint8_t flg = src[s];
    uint8_t bd = src[s + 1];
    s += 2;
    if (((flg >> 6) & 3) != 1) return TPULZ4_E_FRAME_VERSION;
    if (flg & 0b10) return TPULZ4_E_FRAME_RESERVED;
    // DictID frames (spec v1.6+ bit 0) need the caller-supplied
    // dictionary; route through the Python reader (formats/frame.py)
    if (flg & 0b01) return TPULZ4_E_FRAME_DICTID;
    const bool dependent = !(flg & (1 << 5));
    if (dependent && !allow_dependent) return TPULZ4_E_FRAME_DEPENDENT;
    if (bd & 0x8F) return TPULZ4_E_FRAME_RESERVED;
    int bsid = (bd >> 4) & 7;
    if (bsid < 4 || bsid > 7) return TPULZ4_E_FRAME_BLOCKSIZE;
    const int64_t bs = (int64_t)1 << (2 * bsid + 8);
    bool has_csize = flg & (1 << 3);
    bool has_bsum = flg & (1 << 4);
    bool has_csum = flg & (1 << 2);
    uint64_t expected_size = ~0ull;
    if (has_csize) {
      if (s + 8 > src_len) return TPULZ4_E_FRAME;
      std::memcpy(&expected_size, src + s, 8);
      s += 8;
    }
    if (s + 1 > src_len) return TPULZ4_E_FRAME;
    uint8_t hc = src[s++];
    if ((uint8_t)(tpulz4_xxh32(src + desc_off, s - 1 - desc_off, 0) >> 8) != hc)
      return TPULZ4_E_CHECKSUM;

    // block table walk. Block checksums are only RECORDED here and verified
    // on the decode workers below: a serial xxh32 pass over the compressed
    // payload in this walk costs ~0.1 core-s/GB before any decode starts
    // and was the dominant slice of the all-checksums decode gap
    // (BENCH r3: 2.41 vs 3.12 GB/s; VERDICT r3 #6).
    std::vector<frame::Blk> blocks;
    for (;;) {
      if (s + 4 > src_len) return TPULZ4_E_FRAME;
      uint32_t word = frame::read_u32(src + s);
      s += 4;
      if (word == 0) break;  // end mark
      bool compressed = !(word & FRAME_INCOMPRESSIBLE);
      int32_t len = (int32_t)(word & ~FRAME_INCOMPRESSIBLE);
      if (len > bs) return TPULZ4_E_FRAME_BLOCK_TOO_BIG;
      if (s + len > src_len) return TPULZ4_E_FRAME;
      blocks.push_back({s, len, compressed, 0});
      s += len;
      if (has_bsum) {
        if (s + 4 > src_len) return TPULZ4_E_FRAME;
        blocks.back().bsum = frame::read_u32(src + s);
        s += 4;
      }
    }

    if (dependent) {
      // linked-block frame body: serial, contiguous, history-extended
      // decode (frame::decode_dependent); checksums validated inline/after
      int64_t fd = d;
      int64_t ft = frame::decode_dependent(src, blocks, bs, has_bsum, dest,
                                           fd, dest_cap);
      if (ft < 0) return ft;
      d = fd + ft;
      if (has_csum) {
        if (s + 4 > src_len) return TPULZ4_E_FRAME;
        uint32_t expect = frame::read_u32(src + s);
        s += 4;
        if (expect != tpulz4_xxh32(dest + fd, ft, 0))
          return TPULZ4_E_CHECKSUM;
      }
      if (has_csize && expected_size != (uint64_t)ft) return TPULZ4_E_FRAME;
      if (single_frame) break;
      continue;
    }

    // parallel decompress at stride bs into dest (order-preserving compact
    // afterwards if any interior block decodes short). The content
    // checksum is folded into the decoder threads: after finishing a
    // block, a decoder tries to advance a shared in-order hash frontier
    // over completed blocks. No dedicated hasher thread (a 3rd runnable
    // thread loses ~10% to contention on a 2-core host), the hash work is
    // spread across all decoders, and blocks are hashed cache-warm right
    // after they are decoded.
    const int n = (int)blocks.size();
    const int64_t frame_dest = d;
    std::vector<int32_t> dlens(n, 0);
    std::vector<int32_t> errs(n, 0);
    const bool inband_hash = has_csum && n > 0;
    std::unique_ptr<std::atomic<int>[]> done;
    std::atomic<int> hash_next{0};
    std::atomic_flag hash_busy = ATOMIC_FLAG_INIT;
    std::atomic<bool> had_error{false};
    void* hstate = nullptr;
    if (inband_hash) {
      done.reset(new std::atomic<int>[n]);
      for (int i = 0; i < n; ++i) done[i].store(0, std::memory_order_relaxed);
      hstate = tpulz4_xxh32_create(0);
    }
    auto advance_hash = [&] {
      // hash consecutive completed blocks, in order; try-lock so exactly
      // one thread works the frontier while others keep decoding
      if (hash_busy.test_and_set(std::memory_order_acquire)) return;
      int j = hash_next.load(std::memory_order_relaxed);
      while (j < n && done[j].load(std::memory_order_acquire) == 1) {
        tpulz4_xxh32_update(hstate, dest + frame_dest + (int64_t)j * bs,
                            dlens[j]);
        ++j;
      }
      hash_next.store(j, std::memory_order_relaxed);
      hash_busy.clear(std::memory_order_release);
    };
    parallel_for_dynamic(n, n_threads, [&](int i) {
      // stride-bs layout; every block clamps to the remaining capacity, so
      // an undersized dest surfaces as E_DEST_TOO_SMALL from the block
      int64_t out_off = frame_dest + (int64_t)i * bs;
      int64_t room = dest_cap - out_off;
      int out_max = (int)(room < bs ? (room < 0 ? 0 : room) : bs);
      if (has_bsum && tpulz4_xxh32(src + blocks[i].off, blocks[i].len, 0)
                          != blocks[i].bsum) {
        errs[i] = TPULZ4_E_CHECKSUM;
      } else if (out_max == 0 && blocks[i].len > 0) {
        errs[i] = TPULZ4_E_DEST_TOO_SMALL;
      } else if (blocks[i].compressed) {
        int r = tpulz4_decompress_safe(src + blocks[i].off, blocks[i].len,
                                       dest + out_off, out_max);
        if (r < 0) errs[i] = r; else dlens[i] = r;
      } else if (blocks[i].len > out_max) {
        errs[i] = TPULZ4_E_DEST_TOO_SMALL;
      } else {
        std::memcpy(dest + out_off, src + blocks[i].off, blocks[i].len);
        dlens[i] = blocks[i].len;
      }
      if (done) {
        if (errs[i] < 0) had_error.store(true, std::memory_order_relaxed);
        done[i].store(errs[i] < 0 ? 2 : 1, std::memory_order_release);
        if (!had_error.load(std::memory_order_relaxed)) advance_hash();
      }
    }, [&] {
      if (!inband_hash) return;
      while (!had_error.load(std::memory_order_relaxed) &&
             hash_next.load(std::memory_order_acquire) < n) {
        advance_hash();
        std::this_thread::yield();
      }
    });
    uint32_t content_hash = 0;
    if (inband_hash) {
      if (!had_error.load(std::memory_order_relaxed)) {
        // drain whatever the decode phase did not reach (no-op usually)
        int j = hash_next.load(std::memory_order_relaxed);
        for (; j < n; ++j)
          tpulz4_xxh32_update(hstate, dest + frame_dest + (int64_t)j * bs,
                              dlens[j]);
        content_hash = tpulz4_xxh32_digest(hstate);
      }
      tpulz4_xxh32_free(hstate);
    }
    bool dest_small = false;
    for (int i = 0; i < n; ++i) {
      // a block whose stride slot was clamped below bs can fail with any
      // error code mid-decode (e.g. a match crossing the clamped end looks
      // malformed) — route every clamped-block failure through the serial
      // fallback, which decodes at full bs capacity and reports truthfully
      bool clamped = frame_dest + (int64_t)i * bs + bs > dest_cap;
      if (errs[i] == TPULZ4_E_CHECKSUM)  // independent of dest clamping
        return errs[i];
      if (errs[i] == TPULZ4_E_DEST_TOO_SMALL || (errs[i] < 0 && clamped))
        dest_small = true;
      else if (errs[i] < 0)
        return errs[i];
    }

    int64_t w = frame_dest;
    bool used_serial = false;
    if (dest_small) {
      // The stride layout needs up to n*bs capacity when interior blocks
      // decode short (spec-valid frames from flushing writers). A
      // content-sized dest can still hold the frame — retry serially,
      // decoding each block into a bs scratch and compacting as we go.
      used_serial = true;
      std::vector<uint8_t> scratch((size_t)bs);
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = src + blocks[i].off;
        if (has_bsum && tpulz4_xxh32(p, blocks[i].len, 0) != blocks[i].bsum)
          return TPULZ4_E_CHECKSUM;
        int out_len;
        if (blocks[i].compressed) {
          int r = tpulz4_decompress_safe(p, blocks[i].len, scratch.data(),
                                         (int)bs);
          // scratch is a full-bs slot: DEST_TOO_SMALL here means the
          // block decodes past the frame's max block size — malformed
          // input, not a capacity problem (r5 review #1: reporting it as
          // DEST_TOO_SMALL made the caller's grow-retry unbounded)
          if (r == TPULZ4_E_DEST_TOO_SMALL) return TPULZ4_E_MALFORMED;
          if (r < 0) return r;
          out_len = r;
        } else {
          std::memcpy(scratch.data(), p, blocks[i].len);
          out_len = blocks[i].len;
        }
        if (w + out_len > dest_cap) return TPULZ4_E_DEST_TOO_SMALL;
        std::memcpy(dest + w, scratch.data(), out_len);
        w += out_len;
      }
    } else {
      // compact left if any interior block is short (rare; frames we and
      // the CLI produce have full interior blocks)
      for (int i = 0; i < n; ++i) {
        int64_t out_off = frame_dest + (int64_t)i * bs;
        if (w != out_off && dlens[i] > 0)
          std::memmove(dest + w, dest + out_off, dlens[i]);
        w += dlens[i];
      }
    }
    int64_t frame_total = w - frame_dest;
    d = w;

    if (has_csum) {
      if (s + 4 > src_len) return TPULZ4_E_FRAME;
      uint32_t expect = frame::read_u32(src + s);
      s += 4;
      uint32_t got = (inband_hash && !used_serial)
                         ? content_hash
                         : tpulz4_xxh32(dest + frame_dest, frame_total, 0);
      if (expect != got)
        return TPULZ4_E_CHECKSUM;
    }
    if (has_csize && expected_size != (uint64_t)frame_total)
      return TPULZ4_E_FRAME;
    if (single_frame) break;
  }
  if (consumed_out) *consumed_out = s;
  return d;
}

// ---------------------------------------------------------------------------
// one-shot legacy "LZ4Block" stream codec (LZ4BlockOutputStream.java:39-69,
// 189-266, LZ4BlockInputStream.java:150-260; formats/block_stream.py)
// ---------------------------------------------------------------------------
//
// block  = "LZ4Block" token(1) compressed_len(4 LE) original_len(4 LE)
//          checksum(4 LE) payload
// token  = method {0x10 raw, 0x20 LZ4} | level = ceil(log2(bs)) - 10
// check  = xxh32(raw, seed 0x9747B28C) & 0xFFFFFFF (the reference's 28-bit
//          Checksum-adapter quirk, StreamingXXHash32.java:101-107)

namespace blockstream {
constexpr int MAGIC_LEN = 8;
constexpr int HEADER_LEN = MAGIC_LEN + 1 + 4 + 4 + 4;  // 21
constexpr uint8_t MAGIC[MAGIC_LEN] = {'L', 'Z', '4', 'B', 'l', 'o', 'c', 'k'};
constexpr int LEVEL_BASE = 10;
constexpr int METHOD_RAW = 0x10;
constexpr int METHOD_LZ4 = 0x20;
constexpr uint32_t SEED = 0x9747B28Cu;

inline int level_for(int block_size) {
  int lvl = 0;
  while ((1 << (LEVEL_BASE + lvl)) < block_size) ++lvl;
  return lvl;
}
}  // namespace blockstream

TPULZ4_API int64_t tpulz4_blockstream_compress_bound(int64_t raw_len,
                                                     int32_t block_size) {
  if (block_size < 64 || block_size > (1 << 25) || raw_len < 0)
    return TPULZ4_E_PARAM;
  int64_t n = raw_len ? (raw_len + block_size - 1) / block_size : 0;
  return (n + 1) * (blockstream::HEADER_LEN +
                    tpulz4_max_compressed_length(block_size));
}

TPULZ4_API int64_t tpulz4_blockstream_compress(
    const uint8_t* raw, int64_t raw_len, int32_t block_size,
    uint8_t* dest, int64_t dest_cap, int32_t n_threads) {
  using namespace blockstream;
  if (block_size < 64 || block_size > (1 << 25) || raw_len < 0)
    return TPULZ4_E_PARAM;
  if (dest_cap < tpulz4_blockstream_compress_bound(raw_len, block_size))
    return TPULZ4_E_DEST_TOO_SMALL;
  const int level = level_for(block_size);
  const int n = raw_len ? (int)((raw_len + block_size - 1) / block_size) : 0;
  const int cap = tpulz4_max_compressed_length(block_size);

  // parallel compress with emission folded into the compress threads via
  // an in-order frontier (see tpulz4_frame_compress); block checksums are
  // per-block (seeded, unordered) and run on the compressing thread.
  frame::ScratchLease scratch((size_t)n * cap);
  if (n > 0 && scratch.get() == nullptr) return TPULZ4_E_PARAM;
  std::vector<int32_t> clens(n);
  std::vector<uint32_t> checks(n);
  std::unique_ptr<std::atomic<int>[]> done(new std::atomic<int>[n ? n : 1]);
  for (int i = 0; i < n; ++i) done[i].store(0, std::memory_order_relaxed);
  std::atomic<int> emit_next{0};
  std::atomic_flag emit_busy = ATOMIC_FLAG_INIT;
  std::atomic<bool> had_error{false};
  int64_t demit = 0;

  auto emit_block = [&](int j) {
    int64_t off = (int64_t)j * block_size;
    int olen = (int)(raw_len - off < block_size ? raw_len - off : block_size);
    const uint8_t* payload;
    int method, plen;
    if (clens[j] >= olen) {
      payload = raw + off;
      plen = olen;
      method = METHOD_RAW;
    } else {
      payload = scratch.get() + (size_t)j * cap;
      plen = clens[j];
      method = METHOD_LZ4;
    }
    std::memcpy(dest + demit, MAGIC, MAGIC_LEN);
    dest[demit + MAGIC_LEN] = (uint8_t)(method | level);
    frame::write_u32(dest + demit + MAGIC_LEN + 1, (uint32_t)plen);
    frame::write_u32(dest + demit + MAGIC_LEN + 5, (uint32_t)olen);
    frame::write_u32(dest + demit + MAGIC_LEN + 9, checks[j]);
    demit += HEADER_LEN;
    std::memcpy(dest + demit, payload, plen);
    demit += plen;
  };
  auto advance_emit = [&] {
    if (emit_busy.test_and_set(std::memory_order_acquire)) return;
    int j = emit_next.load(std::memory_order_relaxed);
    while (j < n && done[j].load(std::memory_order_acquire) == 1) {
      emit_block(j);
      ++j;
    }
    emit_next.store(j, std::memory_order_relaxed);
    emit_busy.clear(std::memory_order_release);
  };

  parallel_for_dynamic(n, n_threads, [&](int i) {
    int64_t off = (int64_t)i * block_size;
    int len = (int)(raw_len - off < block_size ? raw_len - off : block_size);
    checks[i] = tpulz4_xxh32(raw + off, len, SEED) & 0xFFFFFFFu;
    clens[i] = tpulz4_compress_fast(raw + off, len,
                                    scratch.get() + (size_t)i * cap, cap);
    if (clens[i] < 0) {
      had_error.store(true, std::memory_order_relaxed);
      done[i].store(2, std::memory_order_release);
      return;
    }
    done[i].store(1, std::memory_order_release);
    if (!had_error.load(std::memory_order_relaxed)) advance_emit();
  }, [&] {
    while (!had_error.load(std::memory_order_relaxed) &&
           emit_next.load(std::memory_order_acquire) < n) {
      advance_emit();
      std::this_thread::yield();
    }
  });
  if (had_error.load(std::memory_order_relaxed))
    for (int i = 0; i < n; ++i)
      if (clens[i] < 0) return clens[i];
  for (int j = emit_next.load(std::memory_order_relaxed); j < n; ++j)
    emit_block(j);
  int64_t d = demit;
  // empty-block end marker (LZ4BlockOutputStream.java:255-266)
  std::memcpy(dest + d, MAGIC, MAGIC_LEN);
  dest[d + MAGIC_LEN] = (uint8_t)(METHOD_RAW | level);
  std::memset(dest + d + MAGIC_LEN + 1, 0, 12);
  d += HEADER_LEN;
  return d;
}

TPULZ4_API int64_t tpulz4_blockstream_decompress(
    const uint8_t* src, int64_t src_len, uint8_t* dest, int64_t dest_cap,
    int32_t n_threads, int32_t stop_on_empty, int64_t* consumed_out) {
  using namespace blockstream;
  struct Blk { int64_t src_off; int64_t dst_off; int32_t clen, olen;
               uint32_t check; bool raw; };
  std::vector<Blk> blocks;
  int64_t s = 0, total = 0;
  bool done = false;
  while (!done) {
    if (s >= src_len) {
      if (stop_on_empty) return TPULZ4_E_FRAME;  // ended prematurely
      break;  // concatenated-stream mode ends cleanly at EOF
    }
    if (s + HEADER_LEN > src_len) return TPULZ4_E_FRAME;
    if (std::memcmp(src + s, MAGIC, MAGIC_LEN) != 0) return TPULZ4_E_FRAME;
    int token = src[s + MAGIC_LEN];
    int method = token & 0xF0;
    int level = LEVEL_BASE + (token & 0x0F);
    if (method != METHOD_RAW && method != METHOD_LZ4) return TPULZ4_E_FRAME;
    uint32_t clen = frame::read_u32(src + s + MAGIC_LEN + 1);
    uint32_t olen = frame::read_u32(src + s + MAGIC_LEN + 5);
    uint32_t check = frame::read_u32(src + s + MAGIC_LEN + 9);
    if (olen > (uint32_t)(1u << level) || ((olen == 0) != (clen == 0)) ||
        (method == METHOD_RAW && olen != clen))
      return TPULZ4_E_FRAME;
    s += HEADER_LEN;
    if (olen == 0) {
      if (check != 0) return TPULZ4_E_FRAME;
      if (stop_on_empty) done = true;
      continue;  // concatenated mode: keep walking
    }
    if (s + clen > src_len) return TPULZ4_E_FRAME;
    if (total + olen > dest_cap) return TPULZ4_E_DEST_TOO_SMALL;
    blocks.push_back({s, total, (int32_t)clen, (int32_t)olen, check,
                      method == METHOD_RAW});
    s += clen;
    total += olen;
  }

  std::vector<int32_t> errs(blocks.size(), 0);
  // dynamic scheduling: per-block decode cost varies with content, and the
  // shared counter keeps both cores busy to the end (the static strided
  // split left the tail imbalance to one thread)
  parallel_for_dynamic((int)blocks.size(), n_threads, [&](int i) {
    const Blk& b = blocks[i];
    if (b.raw) {
      std::memcpy(dest + b.dst_off, src + b.src_off, b.olen);
    } else {
      int r = tpulz4_decompress_fast(src + b.src_off, b.clen,
                                     dest + b.dst_off, b.olen);
      if (r != b.clen) { errs[i] = TPULZ4_E_FRAME; return; }
    }
    if ((tpulz4_xxh32(dest + b.dst_off, b.olen, SEED) & 0xFFFFFFFu) != b.check)
      errs[i] = TPULZ4_E_CHECKSUM;
  }, [] {});
  for (int32_t e : errs)
    if (e < 0) return e;
  if (consumed_out) *consumed_out = s;
  return total;
}

TPULZ4_API const char* tpulz4_version() { return "tpulz4-native " TPULZ4_VERSION_STR; }
