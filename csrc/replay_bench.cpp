// Standalone phase-isolation benchmark for the AVX-512 replay kernel.
// Dev tool: reads the raw fixture dumped by benchmarks/replay_microbench.py
// prep (tools/capture_emissions.py -> /tmp/fx_{cr,ci,it}.bin) and times the
// vector phase and increment phase separately, plus variants, so kernel
// changes are guided by measurement instead of uop guesses.
//
// Build: make -C csrc replay_bench && ./csrc/replay_bench
//
// Not linked into the production library; production code is
// tpubrot_native.cpp.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <immintrin.h>

namespace {

constexpr int kW = 1000, kH = 1000;
constexpr float kMinR = -2.0f, kMinI = -2.0f;
constexpr float kInvD = 250.0f;  // 1000 / 4.0

constexpr int kGroups = 4;
constexpr int kLanesAvx = kGroups * 16;
constexpr int kBufCap = 4096;

struct IncBuf {
  alignas(64) int32_t idx[kBufCap];
  int n = 0;
};

double Now() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

// Mode 0: full kernel (vector + batched increments).
// Mode 1: vector phase only (buffer reset without increments).
// Mode 2: vector phase minus compressstore (sink = OR of idx vectors).
// Mode 4: append flushed buffers to *trace instead of incrementing.
template <int kMode>
uint64_t Replay(const float* cr, const float* ci, const int32_t* iters,
                int count, uint32_t* hist, IncBuf& buf,
                std::vector<int32_t>* trace = nullptr) {
  __m512 vzr[kGroups], vzi[kGroups], vcr[kGroups], vci[kGroups];
  __m512i vlim[kGroups];
  int32_t gmax[kGroups], gmin[kGroups];
  int32_t max_iter = -1;
  for (int g = 0; g < kGroups; ++g) {
    const int base = g * 16;
    const int live_n = count - base;
    const __mmask16 live =
        live_n >= 16
            ? static_cast<__mmask16>(0xFFFF)
            : static_cast<__mmask16>((1u << (live_n < 0 ? 0 : live_n)) - 1);
    vcr[g] = _mm512_maskz_loadu_ps(live, cr + base);
    vci[g] = _mm512_maskz_loadu_ps(live, ci + base);
    vzr[g] = vcr[g];
    vzi[g] = vci[g];
    vlim[g] =
        _mm512_mask_loadu_epi32(_mm512_set1_epi32(-1), live, iters + base);
    gmax[g] = _mm512_reduce_max_epi32(vlim[g]);
    gmin[g] = _mm512_reduce_min_epi32(vlim[g]);
    if (gmax[g] > max_iter) max_iter = gmax[g];
  }

  const __m512 min_r = _mm512_set1_ps(kMinR);
  const __m512 min_i = _mm512_set1_ps(kMinI);
  const __m512 inv_dr = _mm512_set1_ps(kInvD);
  const __m512 inv_di = _mm512_set1_ps(kInvD);
  const __m512i vw = _mm512_set1_epi32(kW);
  const __m512i vh = _mm512_set1_epi32(kH);

  uint64_t hits = 0;
  __m512i sink = _mm512_setzero_si512();
  for (int32_t s = 0; s <= max_iter; ++s) {
    const __m512i vs = _mm512_set1_epi32(s);
    for (int g = 0; g < kGroups; ++g) {
      if (s > gmax[g]) continue;
      __m512 r = vzr[g], im = vzi[g];
      const __m512 nr = _mm512_add_ps(
          _mm512_sub_ps(_mm512_mul_ps(r, r), _mm512_mul_ps(im, im)), vcr[g]);
      const __m512 ni =
          _mm512_add_ps(_mm512_mul_ps(_mm512_add_ps(r, r), im), vci[g]);
      __mmask16 rec;
      if (s <= gmin[g]) {
        vzr[g] = nr;
        vzi[g] = ni;
        rec = static_cast<__mmask16>(0xFFFF);
      } else {
        rec = _mm512_cmple_epi32_mask(vs, vlim[g]);
        vzr[g] = _mm512_mask_mov_ps(vzr[g], rec, nr);
        vzi[g] = _mm512_mask_mov_ps(vzi[g], rec, ni);
      }
      const __m512i col = _mm512_cvt_roundps_epi32(
          _mm512_mul_ps(_mm512_sub_ps(nr, min_r), inv_dr),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      const __m512i row = _mm512_cvt_roundps_epi32(
          _mm512_mul_ps(_mm512_sub_ps(ni, min_i), inv_di),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      __mmask16 ok = _mm512_mask_cmplt_epu32_mask(rec, col, vw);
      ok = _mm512_mask_cmplt_epu32_mask(ok, row, vh);
      const __m512i idx = _mm512_add_epi32(_mm512_mullo_epi32(row, vw), col);
      if (kMode == 2) {
        sink = _mm512_or_si512(sink, _mm512_maskz_mov_epi32(ok, idx));
      } else {
        _mm512_mask_compressstoreu_epi32(buf.idx + buf.n, ok, idx);
      }
      const int c = __builtin_popcount(static_cast<unsigned>(ok));
      if (kMode != 2) buf.n += c;
      hits += static_cast<uint64_t>(c);
    }
    if (kMode == 0) {
      if (buf.n > kBufCap - kLanesAvx) {
        const int n = buf.n;
        const int32_t* b = buf.idx;
        for (int i = 0; i < n; ++i) ++hist[b[i]];
        buf.n = 0;
      }
    } else if (kMode == 1) {
      if (buf.n > kBufCap - kLanesAvx) buf.n = 0;
    } else if (kMode == 4) {
      if (buf.n > kBufCap - kLanesAvx) {
        trace->insert(trace->end(), buf.idx, buf.idx + buf.n);
        buf.n = 0;
      }
    }
  }
  if (kMode == 2) hist[0] ^= _mm512_reduce_or_epi32(sink);
  return hits;
}

// Mode 3: increments only, over a pre-recorded index trace.
uint64_t IncrementTrace(const std::vector<int32_t>& trace, uint32_t* hist) {
  for (size_t i = 0; i < trace.size(); ++i) ++hist[trace[i]];
  return trace.size();
}

// Variant 5: per-group buffers (breaks the buf.n serial chain across
// groups) + compress-to-register with an unmasked full store (trailing
// garbage is overwritten by the next store; flush reads only [0, n)).
constexpr int kGBufCap = 2048;
struct GroupBufs {
  alignas(64) int32_t idx[kGroups][kGBufCap + 16];
  int n[kGroups] = {0, 0, 0, 0};
};

template <bool kInc>
uint64_t ReplayPerGroup(const float* cr, const float* ci,
                        const int32_t* iters, int count, uint32_t* hist,
                        GroupBufs& buf) {
  __m512 vzr[kGroups], vzi[kGroups], vcr[kGroups], vci[kGroups];
  __m512i vlim[kGroups];
  int32_t gmax[kGroups], gmin[kGroups];
  int32_t max_iter = -1;
  for (int g = 0; g < kGroups; ++g) {
    const int base = g * 16;
    const int live_n = count - base;
    const __mmask16 live =
        live_n >= 16
            ? static_cast<__mmask16>(0xFFFF)
            : static_cast<__mmask16>((1u << (live_n < 0 ? 0 : live_n)) - 1);
    vcr[g] = _mm512_maskz_loadu_ps(live, cr + base);
    vci[g] = _mm512_maskz_loadu_ps(live, ci + base);
    vzr[g] = vcr[g];
    vzi[g] = vci[g];
    vlim[g] =
        _mm512_mask_loadu_epi32(_mm512_set1_epi32(-1), live, iters + base);
    gmax[g] = _mm512_reduce_max_epi32(vlim[g]);
    gmin[g] = _mm512_reduce_min_epi32(vlim[g]);
    if (gmax[g] > max_iter) max_iter = gmax[g];
  }

  const __m512 min_r = _mm512_set1_ps(kMinR);
  const __m512 min_i = _mm512_set1_ps(kMinI);
  const __m512 inv_dr = _mm512_set1_ps(kInvD);
  const __m512 inv_di = _mm512_set1_ps(kInvD);
  const __m512i vw = _mm512_set1_epi32(kW);
  const __m512i vh = _mm512_set1_epi32(kH);

  uint64_t hits = 0;
  for (int32_t s = 0; s <= max_iter; ++s) {
    const __m512i vs = _mm512_set1_epi32(s);
    for (int g = 0; g < kGroups; ++g) {
      if (s > gmax[g]) continue;
      __m512 r = vzr[g], im = vzi[g];
      const __m512 nr = _mm512_add_ps(
          _mm512_sub_ps(_mm512_mul_ps(r, r), _mm512_mul_ps(im, im)), vcr[g]);
      const __m512 ni =
          _mm512_add_ps(_mm512_mul_ps(_mm512_add_ps(r, r), im), vci[g]);
      __mmask16 rec;
      if (s <= gmin[g]) {
        vzr[g] = nr;
        vzi[g] = ni;
        rec = static_cast<__mmask16>(0xFFFF);
      } else {
        rec = _mm512_cmple_epi32_mask(vs, vlim[g]);
        vzr[g] = _mm512_mask_mov_ps(vzr[g], rec, nr);
        vzi[g] = _mm512_mask_mov_ps(vzi[g], rec, ni);
      }
      const __m512i col = _mm512_cvt_roundps_epi32(
          _mm512_mul_ps(_mm512_sub_ps(nr, min_r), inv_dr),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      const __m512i row = _mm512_cvt_roundps_epi32(
          _mm512_mul_ps(_mm512_sub_ps(ni, min_i), inv_di),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      __mmask16 ok = _mm512_mask_cmplt_epu32_mask(rec, col, vw);
      ok = _mm512_mask_cmplt_epu32_mask(ok, row, vh);
      const __m512i idx = _mm512_add_epi32(_mm512_mullo_epi32(row, vw), col);
      const int bn = buf.n[g];
      _mm512_storeu_si512(
          reinterpret_cast<void*>(buf.idx[g] + bn),
          _mm512_maskz_compress_epi32(ok, idx));
      const int c = __builtin_popcount(static_cast<unsigned>(ok));
      buf.n[g] = bn + c;
      hits += static_cast<uint64_t>(c);
      if (bn + c > kGBufCap - 16) {
        if (kInc) {
          const int32_t* b = buf.idx[g];
          const int nn = bn + c;
          for (int i = 0; i < nn; ++i) ++hist[b[i]];
        }
        buf.n[g] = 0;
      }
    }
  }
  return hits;
}

template <int kMode>
void RunMode(const char* name, const float* cr, const float* ci,
             const int32_t* it, int64_t n, uint64_t pts,
             std::vector<uint32_t>& hist) {
  double best = 1e30;
  uint64_t hits = 0;
  for (int rep = 0; rep < 5; ++rep) {
    IncBuf buf;
    const double t0 = Now();
    uint64_t h = 0;
    for (int64_t i = 0; i < n; i += kLanesAvx) {
      const int count = static_cast<int>(n - i < kLanesAvx ? n - i : kLanesAvx);
      h += Replay<kMode>(cr + i, ci + i, it + i, count, hist.data(), buf);
    }
    if (kMode == 0) {
      for (int i = 0; i < buf.n; ++i) ++hist[buf.idx[i]];
    }
    const double dt = Now() - t0;
    if (dt < best) best = dt;
    hits = h;
  }
  std::printf("%-28s best %7.1f ms  %.3e pts/s  hits %llu\n", name,
              best * 1e3, pts / best,
              static_cast<unsigned long long>(hits));
}

}  // namespace

int main() {
  FILE* fr = std::fopen("/tmp/fx_cr.bin", "rb");
  FILE* fi = std::fopen("/tmp/fx_ci.bin", "rb");
  FILE* ft = std::fopen("/tmp/fx_it.bin", "rb");
  if (!fr || !fi || !ft) {
    std::fprintf(stderr, "fixture missing; run tools/capture_emissions.py "
                         "and dump to /tmp/fx_*.bin\n");
    return 1;
  }
  std::fseek(fr, 0, SEEK_END);
  const int64_t n = std::ftell(fr) / 4;
  std::fseek(fr, 0, SEEK_SET);
  std::vector<float> cr(n), ci(n);
  std::vector<int32_t> it(n);
  if (std::fread(cr.data(), 4, n, fr) != static_cast<size_t>(n) ||
      std::fread(ci.data(), 4, n, fi) != static_cast<size_t>(n) ||
      std::fread(it.data(), 4, n, ft) != static_cast<size_t>(n)) {
    std::fprintf(stderr, "short read\n");
    return 1;
  }
  std::fclose(fr);
  std::fclose(fi);
  std::fclose(ft);

  uint64_t pts = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (it[i] >= 0) pts += static_cast<uint64_t>(it[i]) + 1;
  }
  std::printf("fixture: %lld slots, %llu points\n",
              static_cast<long long>(n), static_cast<unsigned long long>(pts));

  std::vector<uint32_t> hist(static_cast<size_t>(kW) * kH, 0);

  RunMode<0>("full (vector+increments)", cr.data(), ci.data(), it.data(), n,
             pts, hist);
  RunMode<1>("vector+compressstore", cr.data(), ci.data(), it.data(), n, pts,
             hist);
  RunMode<2>("vector only (no store)", cr.data(), ci.data(), it.data(), n,
             pts, hist);

  auto run_pergroup = [&](const char* name, bool inc) {
    double best = 1e30;
    uint64_t hits = 0;
    for (int rep = 0; rep < 5; ++rep) {
      GroupBufs buf;
      const double t0 = Now();
      uint64_t h = 0;
      for (int64_t i = 0; i < n; i += kLanesAvx) {
        const int count =
            static_cast<int>(n - i < kLanesAvx ? n - i : kLanesAvx);
        h += inc ? ReplayPerGroup<true>(cr.data() + i, ci.data() + i,
                                        it.data() + i, count, hist.data(),
                                        buf)
                 : ReplayPerGroup<false>(cr.data() + i, ci.data() + i,
                                         it.data() + i, count, hist.data(),
                                         buf);
      }
      if (inc) {
        for (int g = 0; g < kGroups; ++g) {
          for (int j = 0; j < buf.n[g]; ++j) ++hist[buf.idx[g][j]];
        }
      }
      const double dt = Now() - t0;
      if (dt < best) best = dt;
      hits = h;
    }
    std::printf("%-28s best %7.1f ms  %.3e pts/s  hits %llu\n", name,
                best * 1e3, pts / best, static_cast<unsigned long long>(hits));
  };
  run_pergroup("pergroup full", true);
  run_pergroup("pergroup vector only", false);

  // Record the REAL increment trace (bin indices in flush order), then
  // time increment strategies against it.
  std::vector<int32_t> trace;
  {
    trace.reserve(pts);
    IncBuf buf;
    for (int64_t i = 0; i < n; i += kLanesAvx) {
      const int count = static_cast<int>(n - i < kLanesAvx ? n - i : kLanesAvx);
      Replay<4>(cr.data() + i, ci.data() + i, it.data() + i, count,
                hist.data(), buf, &trace);
    }
    for (int i = 0; i < buf.n; ++i) trace.push_back(buf.idx[i]);
    std::printf("real trace: %zu increments\n", trace.size());
    if (FILE* tf = std::fopen("/tmp/fx_trace.bin", "wb")) {
      const size_t cap = std::min<size_t>(trace.size(), 32u << 20);
      std::fwrite(trace.data(), 4, cap, tf);
      std::fclose(tf);
    }
  }

  auto time_inc = [&](const char* name, auto fn) {
    double best = 1e30;
    for (int rep = 0; rep < 5; ++rep) {
      const double t0 = Now();
      fn();
      const double dt = Now() - t0;
      if (dt < best) best = dt;
    }
    std::printf("%-28s best %7.1f ms  %.3e inc/s\n", name, best * 1e3,
                trace.size() / best);
  };

  time_inc("inc: scalar (real trace)", [&] {
    const int32_t* b = trace.data();
    const size_t m = trace.size();
    uint32_t* hh = hist.data();
    for (size_t i = 0; i < m; ++i) ++hh[b[i]];
  });

  time_inc("inc: simd conflict g/s", [&] {
    const int32_t* b = trace.data();
    const size_t m = trace.size();
    uint32_t* hh = hist.data();
    const __m512i one = _mm512_set1_epi32(1);
    size_t i = 0;
    for (; i + 16 <= m; i += 16) {
      const __m512i vidx =
          _mm512_loadu_si512(reinterpret_cast<const void*>(b + i));
      const __m512i conf = _mm512_conflict_epi32(vidx);
      const __m512i add = _mm512_add_epi32(_mm512_popcnt_epi32(conf), one);
      __m512i vals = _mm512_i32gather_epi32(vidx, hh, 4);
      vals = _mm512_add_epi32(vals, add);
      _mm512_i32scatter_epi32(hh, vidx, vals, 4);
    }
    for (; i < m; ++i) ++hh[b[i]];
  });

  // Radix-partitioned increments: split a chunk of the trace into K
  // bucket streams by bin range (each bucket's histogram slice is cache-
  // sized), then increment bucket by bucket.
  // Bucket by high index bits (shift, no division). The chunk must be
  // large enough that each bucket's increments exceed its slice's cache
  // lines, or there is no reuse to win.
  auto radix_inc = [&](int kbits, size_t chunk_log2, const char* name) {
    const int K = 1 << kbits;
    const int shift = 20 - kbits;  // bins < 2^20 for the 1000x1000 canvas
    const size_t chunk = size_t{1} << chunk_log2;
    std::vector<int32_t> scratch(chunk);
    std::vector<int32_t*> heads(K);
    std::vector<int32_t> counts(K);
    time_inc(name, [&] {
      const int32_t* b = trace.data();
      const size_t m = trace.size();
      uint32_t* hh = hist.data();
      for (size_t base = 0; base < m; base += chunk) {
        const size_t e = std::min(m - base, chunk);
        std::fill(counts.begin(), counts.end(), 0);
        for (size_t i = 0; i < e; ++i) {
          ++counts[static_cast<uint32_t>(b[base + i]) >> shift];
        }
        int32_t off = 0;
        for (int k = 0; k < K; ++k) {
          heads[k] = scratch.data() + off;
          off += counts[k];
        }
        for (size_t i = 0; i < e; ++i) {
          const int32_t v = b[base + i];
          *heads[static_cast<uint32_t>(v) >> shift]++ = v;
        }
        for (size_t i = 0; i < e; ++i) ++hh[scratch[i]];
      }
    });
  };
  radix_inc(3, 23, "inc: radix8/8M (512KB sl)");
  radix_inc(5, 23, "inc: radix32/8M (128KB sl)");
  radix_inc(5, 21, "inc: radix32/2M (128KB sl)");

  // Random-index reference point (no locality).
  {
    std::vector<int32_t> rnd(trace.size());
    uint64_t x = 0x9E3779B97F4A7C15ull;
    for (auto& v : rnd) {
      x ^= x << 13; x ^= x >> 7; x ^= x << 17;
      v = static_cast<int32_t>(x % (static_cast<uint64_t>(kW) * kH));
    }
    double best = 1e30;
    for (int rep = 0; rep < 5; ++rep) {
      const double t0 = Now();
      IncrementTrace(rnd, hist.data());
      const double dt = Now() - t0;
      if (dt < best) best = dt;
    }
    std::printf("%-28s best %7.1f ms  %.3e inc/s\n", "inc: scalar random idx",
                best * 1e3, rnd.size() / best);
  }
  return 0;
}
