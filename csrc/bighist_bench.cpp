// Big-canvas histogram-increment benchmark: what is the fastest way to
// apply ~3.4e8 orbit-point increments to a histogram that is far larger
// than the LLC (20000x20000 u32 = 1.6 GB)?
//
// The production bottleneck this probes: at the north-star config the
// host replay floor drops from ~0.75-1e9 pts/s (LLC-resident 1000^2
// canvas, PERF_NOTES "phase breakdown") to ~7.3e7 pts/s — random 4-byte
// RMW over DRAM. Round-3's radix-partition experiments (replay_bench
// "inc: radix*") were measured only on the LLC-RESIDENT histogram, where
// partitioning can only lose; this bench measures the above-LLC regime
// they were designed for, plus transparent-huge-page backing (a 1.6 GB
// random-access buffer on 4 KB pages misses the TLB on every access).
//
// Trace source: the real headline emission fixture (tools/
// capture_emissions.py -> /tmp/fx_*.bin) replayed onto a 20000^2 canvas,
// so increment locality (orbit revisits etc.) matches production.
//
// Build: make -C csrc bighist_bench && ./csrc/bighist_bench
// Dev tool only; production code is tpubrot_native.cpp.

#include <sys/mman.h>

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <immintrin.h>

namespace {

constexpr int kW = 20000, kH = 20000;
constexpr float kMinR = -2.0f, kMinI = -2.0f;
constexpr float kInvD = kW / 4.0f;

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

// Replay the fixture and append every on-canvas bin index to *trace
// (replay_bench mode 4, canvas scaled to 20000^2).
uint64_t TraceReplay(const float* cr, const float* ci, const int32_t* iters,
                     int count, IncBuf& buf, std::vector<int32_t>* trace) {
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
  const __m512 inv_d = _mm512_set1_ps(kInvD);
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
          _mm512_mul_ps(_mm512_sub_ps(nr, min_r), inv_d),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      const __m512i row = _mm512_cvt_roundps_epi32(
          _mm512_mul_ps(_mm512_sub_ps(ni, min_i), inv_d),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      __mmask16 ok = _mm512_mask_cmplt_epu32_mask(rec, col, vw);
      ok = _mm512_mask_cmplt_epu32_mask(ok, row, vh);
      const __m512i idx = _mm512_add_epi32(_mm512_mullo_epi32(row, vw), col);
      _mm512_mask_compressstoreu_epi32(buf.idx + buf.n, ok, idx);
      const int c = __builtin_popcount(static_cast<unsigned>(ok));
      buf.n += c;
      hits += static_cast<uint64_t>(c);
    }
    if (buf.n > kBufCap - kLanesAvx) {
      trace->insert(trace->end(), buf.idx, buf.idx + buf.n);
      buf.n = 0;
    }
  }
  return hits;
}

// Allocate `bytes` with optional transparent-huge-page hint.
uint32_t* AllocHist(size_t bytes, bool thp) {
  void* p = mmap(nullptr, bytes, PROT_READ | PROT_WRITE,
                 MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
  if (p == MAP_FAILED) {
    std::perror("mmap");
    std::exit(1);
  }
  if (thp) madvise(p, bytes, MADV_HUGEPAGE);
  std::memset(p, 0, bytes);  // fault pages in before timing
  return static_cast<uint32_t*>(p);
}

template <typename Fn>
void Time(const char* name, size_t m, Fn fn, int reps = 3) {
  double best = 1e30;
  for (int rep = 0; rep < reps; ++rep) {
    const double t0 = Now();
    fn();
    const double dt = Now() - t0;
    if (dt < best) best = dt;
  }
  std::printf("%-36s best %8.1f ms  %.3e inc/s\n", name, best * 1e3,
              m / best);
  std::fflush(stdout);
}

}  // namespace

int main(int argc, char** argv) {
  FILE* fr = std::fopen("/tmp/fx_cr.bin", "rb");
  FILE* fi = std::fopen("/tmp/fx_ci.bin", "rb");
  FILE* ft = std::fopen("/tmp/fx_it.bin", "rb");
  if (!fr || !fi || !ft) {
    std::fprintf(stderr, "fixture missing (run tools/capture_emissions.py "
                         "and dump /tmp/fx_*.bin)\n");
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

  std::vector<int32_t> trace;
  trace.reserve(500u << 20 >> 2);
  {
    IncBuf buf;
    const double t0 = Now();
    for (int64_t i = 0; i < n; i += kLanesAvx) {
      const int count =
          static_cast<int>(n - i < kLanesAvx ? n - i : kLanesAvx);
      TraceReplay(cr.data() + i, ci.data() + i, it.data() + i, count, buf,
                  &trace);
    }
    trace.insert(trace.end(), buf.idx, buf.idx + buf.n);
    std::printf("trace: %zu increments (replayed in %.1f ms)\n",
                trace.size(), (Now() - t0) * 1e3);
  }
  const size_t m = trace.size();
  const size_t bins = static_cast<size_t>(kW) * kH;
  const size_t bytes = bins * 4;

  const bool quick = argc > 1 && std::strcmp(argv[1], "quick") == 0;

  for (int thp = 0; thp <= 1; ++thp) {
    uint32_t* hist = AllocHist(bytes, thp != 0);
    const char* tag = thp ? "thp" : "4k ";
    char name[96];

    std::snprintf(name, sizeof name, "[%s] scalar direct", tag);
    Time(name, m, [&] {
      for (size_t i = 0; i < m; ++i) ++hist[trace[i]];
    });

    for (int ahead : {24, 64}) {
      std::snprintf(name, sizeof name, "[%s] scalar prefetch-%d", tag, ahead);
      Time(name, m, [&] {
        const int32_t* b = trace.data();
        size_t i = 0;
        for (; i + ahead < m; ++i) {
          __builtin_prefetch(&hist[b[i + ahead]], 1, 1);
          ++hist[b[i]];
        }
        for (; i < m; ++i) ++hist[b[i]];
      });
    }

    if (!quick) {
      // Radix partition by high bin bits into K band streams; flush each
      // band's increments against its (cache-sized) histogram slice.
      // Chunked so scratch stays bounded; within a chunk each band's
      // slice is loaded once for many increments.
      for (int kbits : {6, 8}) {
        for (size_t chunk_log2 : {26, 28}) {
          const int K = 1 << kbits;
          // bins < 2^29 (4e8); band = id >> (29 - kbits)
          const int shift = 29 - kbits;
          const size_t chunk = std::min(m, size_t{1} << chunk_log2);
          std::vector<int32_t> scratch(chunk);
          std::vector<int64_t> counts(K);
          std::vector<int32_t*> heads(K);
          std::snprintf(name, sizeof name,
                        "[%s] radix%d chunk 2^%zu", tag, K, chunk_log2);
          Time(name, m, [&] {
            const int32_t* b = trace.data();
            uint32_t* hh = hist;
            for (size_t base = 0; base < m; base += chunk) {
              const size_t e = std::min(m - base, chunk);
              std::fill(counts.begin(), counts.end(), 0);
              for (size_t i = 0; i < e; ++i) {
                ++counts[static_cast<uint32_t>(b[base + i]) >> shift];
              }
              int64_t off = 0;
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
        }
      }

      // Same, but the per-band flush walks bands in order with an
      // explicit prefetch — the band slice may still exceed L2.
      {
        const int K = 256;
        const int shift = 29 - 8;
        const size_t chunk = std::min(m, size_t{1} << 28);
        std::vector<int32_t> scratch(chunk);
        std::vector<int64_t> counts(K);
        std::vector<int32_t*> heads(K);
        std::snprintf(name, sizeof name, "[%s] radix256 2^28 + prefetch",
                      tag);
        Time(name, m, [&] {
          const int32_t* b = trace.data();
          uint32_t* hh = hist;
          for (size_t base = 0; base < m; base += chunk) {
            const size_t e = std::min(m - base, chunk);
            std::fill(counts.begin(), counts.end(), 0);
            for (size_t i = 0; i < e; ++i) {
              ++counts[static_cast<uint32_t>(b[base + i]) >> shift];
            }
            int64_t off = 0;
            for (int k = 0; k < K; ++k) {
              heads[k] = scratch.data() + off;
              off += counts[k];
            }
            for (size_t i = 0; i < e; ++i) {
              const int32_t v = b[base + i];
              *heads[static_cast<uint32_t>(v) >> shift]++ = v;
            }
            const int32_t* s = scratch.data();
            size_t i = 0;
            for (; i + 32 < e; ++i) {
              __builtin_prefetch(&hh[s[i + 32]], 1, 1);
              ++hh[s[i]];
            }
            for (; i < e; ++i) ++hh[s[i]];
          }
        });
      }
    }

    // Checksum so nothing is optimized away; also sanity vs direct.
    uint64_t sum = 0;
    for (size_t i = 0; i < bins; ++i) sum += hist[i];
    std::printf("[%s] total mass %llu (trace x runs)\n", tag,
                static_cast<unsigned long long>(sum));
    munmap(hist, bytes);
  }
  return 0;
}
