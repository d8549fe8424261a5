// SA-IS suffix array construction (induced sorting), O(n) time.
//
// This is the native host-side index-construction core of tpufm: the
// TPU-native framework's equivalent of the reference's vendored
// libdivsufsort-64 (reference resources/divsufsort.c, resources/div-tools/),
// which is only used by the index builder (reference src/genFMindex.c:482).
// We implement SA-IS (Nong, Zhang & Chan 2009) from scratch instead of the
// divsufsort two-stage algorithm: simpler, linear-time, and the builder
// derives every k-BWT directly from the full suffix array with vectorized
// gathers (see tpufm/index/builder.py) instead of the reference's serial
// LF-mapping walk (reference src/genFMindex.c:327-400).
//
// Exposed C ABI (used from Python via ctypes):
//   int tpufm_sais_u8(const uint8_t* text, int64_t n, int64_t* sa)
//     Computes the suffix array of text[0..n-1] + an implicit sentinel that
//     compares smaller than every symbol. sa must hold n+1 entries; on
//     return sa[0] == n (the sentinel suffix) and sa[1..n] are the text
//     suffixes in lexicographic order. Returns 0 on success.
//
// Build: g++ -O3 -fPIC -shared -o libtpufm_sais.so sais.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using sidx = int64_t;

// bkt[c] = start (end=false) or one-past-end (end=true) of bucket for symbol c.
void get_buckets(const std::vector<sidx>& cnt, std::vector<sidx>& bkt, bool end) {
  sidx sum = 0;
  for (size_t c = 0; c < cnt.size(); ++c) {
    sum += cnt[c];
    bkt[c] = end ? sum : sum - cnt[c];
  }
}

// Core SA-IS over an integer string s[0..n-1] with symbols in [0, K) where
// s[n-1] is the unique smallest symbol (the sentinel).
template <typename T>
void sais_rec(const T* s, sidx* SA, sidx n, sidx K) {
  if (n == 1) {
    SA[0] = 0;
    return;
  }
  if (n == 2) {
    SA[0] = 1;
    SA[1] = 0;
    return;
  }

  // Classify suffixes: S-type (true) or L-type (false).
  std::vector<bool> stype(n);
  stype[n - 1] = true;
  for (sidx i = n - 2; i >= 0; --i)
    stype[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && stype[i + 1]);
  auto is_lms = [&](sidx i) { return i > 0 && stype[i] && !stype[i - 1]; };

  std::vector<sidx> cnt(K, 0), bkt(K);
  for (sidx i = 0; i < n; ++i) cnt[s[i]]++;

  auto induce = [&]() {
    // Induce L-type suffixes left-to-right from sorted (LMS or S) positions.
    get_buckets(cnt, bkt, /*end=*/false);
    for (sidx i = 0; i < n; ++i) {
      sidx j = SA[i];
      if (j > 0 && !stype[j - 1]) SA[bkt[s[j - 1]]++] = j - 1;
    }
    // Induce S-type suffixes right-to-left.
    get_buckets(cnt, bkt, /*end=*/true);
    for (sidx i = n - 1; i >= 0; --i) {
      sidx j = SA[i];
      if (j > 0 && stype[j - 1]) SA[--bkt[s[j - 1]]] = j - 1;
    }
  };

  // Stage 1: approximately sort LMS suffixes by induced sorting.
  std::fill(SA, SA + n, sidx{-1});
  get_buckets(cnt, bkt, /*end=*/true);
  for (sidx i = 1; i < n; ++i)
    if (is_lms(i)) SA[--bkt[s[i]]] = i;
  induce();

  // Stage 2: compact the (now sorted-by-LMS-prefix) LMS positions, then name
  // each LMS substring to build the reduced problem.
  sidx nlms = 0;
  for (sidx i = 0; i < n; ++i)
    if (SA[i] > 0 && is_lms(SA[i])) SA[nlms++] = SA[i];

  // Name LMS substrings in SA[0..nlms); store names at SA[nlms + pos/2].
  std::fill(SA + nlms, SA + n, sidx{-1});
  sidx name = 0, prev = -1;
  for (sidx r = 0; r < nlms; ++r) {
    sidx pos = SA[r];
    bool differ = false;
    if (prev < 0) {
      differ = true;
    } else {
      // Compare LMS substrings starting at pos and prev (inclusive of the
      // terminating LMS character).
      for (sidx off = 0;; ++off) {
        sidx a = pos + off, b = prev + off;
        if (a == n || b == n) { differ = (a != b); break; }
        if (s[a] != s[b] || stype[a] != stype[b]) { differ = true; break; }
        if (off > 0 && (is_lms(a) || is_lms(b))) { differ = !(is_lms(a) && is_lms(b)); break; }
      }
    }
    if (differ) { ++name; prev = pos; }
    SA[nlms + pos / 2] = name - 1;
  }
  // Compact names into s1 (order of appearance in the text).
  std::vector<sidx> s1(nlms);
  for (sidx i = n - 1, j = nlms - 1; i >= nlms; --i)
    if (SA[i] >= 0) s1[j--] = SA[i];

  // Positions of LMS suffixes in text order.
  std::vector<sidx> lms_pos(nlms);
  for (sidx i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) lms_pos[j++] = i;

  // Stage 3: sort LMS suffixes exactly.
  if (name < nlms) {
    sais_rec<sidx>(s1.data(), SA, nlms, name);
  } else {
    for (sidx i = 0; i < nlms; ++i) SA[s1[i]] = i;
  }
  // SA[0..nlms) is now the suffix array of the reduced string; translate to
  // text positions, in sorted order, stored in s1.
  for (sidx i = 0; i < nlms; ++i) s1[i] = lms_pos[SA[i]];

  // Stage 4: place exactly-sorted LMS suffixes at bucket ends, induce final SA.
  std::fill(SA, SA + n, sidx{-1});
  get_buckets(cnt, bkt, /*end=*/true);
  for (sidx r = nlms - 1; r >= 0; --r) {
    sidx pos = s1[r];
    SA[--bkt[s[pos]]] = pos;
  }
  induce();
}

}  // namespace

extern "C" {

// Suffix array of text + implicit smallest sentinel. sa has n+1 slots.
// Returns 0 on success, -1 on bad arguments, -2 on allocation failure,
// -3 if any input byte is 255 (the +1 sentinel shift would wrap it to 0
// and silently collide with the sentinel).
int tpufm_sais_u8(const uint8_t* text, int64_t n, int64_t* sa) {
  if (n < 0 || !sa || (n > 0 && !text)) return -1;
  if (n == 0) {
    sa[0] = 0;
    return 0;
  }
  try {
    // Shift symbols by +1 so 0 is free for the sentinel.
    std::vector<uint8_t> t(static_cast<size_t>(n) + 1);
    for (int64_t i = 0; i < n; ++i) {
      if (text[i] == 255) return -3;
      t[i] = static_cast<uint8_t>(text[i] + 1);
    }
    t[n] = 0;
    sais_rec<uint8_t>(t.data(), sa, n + 1, 256);
  } catch (const std::bad_alloc&) {
    return -2;  // keep the C ABI contract: no exception crosses ctypes
  }
  return 0;
}

}  // extern "C"
