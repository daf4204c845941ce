// tpubrot native runtime core.
//
// The reference implements its host runtime in C (file IO, byte-swapped
// image encode, raw checkpoint dumps — cudabrot.cu:191-280, 548-577); this
// library is the TPU framework's native equivalent, plus one piece the
// reference does on the GPU: orbit replay + histogram scatter
// (IterateAndRecord/IncrementPixelCounter, cudabrot.cu:302-365).
//
// Why replay lives here: TPUs have no scatter hardware — measured XLA
// scatter-add tops out near 1.5e8 points/s/chip (benchmarks/PERF_NOTES.md)
// — while the host CPU sits idle during classification. The engine ships
// the tiny in-band emission stream (12 bytes/sample) to the host and this
// code replays the orbits with SIMD-friendly fixed-width lanes and
// accumulates the histogram in cache, fully overlapped with the next TPU
// classify pass. Per-thread private histograms make the accumulation
// deterministic and race-free (the reference's device adds deliberately
// race and lose counts, cudabrot.cu:312).
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <type_traits>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

constexpr int kLanes = 16;  // fixed SIMD width for the replay inner loops

// ---- strict (contraction-proof) f32 orbit arithmetic ----------------
//
// The Mosaic TPU compiler lowers the classify kernels' f32 orbit step
// with strict one-rounding-per-op semantics (measured:
// benchmarks/fma_probe.py — Pallas-on-TPU bit-matches numpy-strict for
// 512 iterations), while gcc at this library's -O3 contracts the same
// expressions into FMAs (matching XLA's CPU emitter, which also
// contracts). Workloads whose ESTIMATOR couples kernel-side selection
// to replay-side deposits — Metropolis-Hastings acceptance driven by
// the kernel's canvas-visit count, and the canvas emit filter's
// visit-gated emissions — need the replayed trajectory to BIT-MATCH
// the kernel stream, or the selection conditions on kernel-stream luck
// the replay cannot reproduce (measured on silicon before this
// variant: 44% of MH tenure mass lost, MH-vs-uniform histogram
// correlation 0.008 at a 6e-3 crop where the CPU run of the identical
// code measures ~1.0). Callers therefore pass flags bit 1 ("strict")
// when and only when the payload was classified under strict
// semantics: TPU-compiled kernels. CPU-compiled kernels (tests,
// interpret mode) keep the default contracted path, which bit-matches
// XLA CPU today. ValueBarrier pins a value into a register so the
// compiler cannot substitute the unrounded product into a neighboring
// add (zero instruction cost; works at any optimization level).
inline void ValueBarrier(float& v) { asm("" : "+x"(v)); }
#if defined(__AVX512F__)
inline void ValueBarrier(__m512& v) { asm("" : "+v"(v)); }
#endif
// The f64 replay paths serve df32-classified payloads; a df32 stream
// cannot be bit-matched by ANY f64 arithmetic, so they have no strict
// variant (the df32<->f64 agreement contract is statistical and
// measured — see engines/host_replay.py).
inline void ValueBarrier(double&) {}

constexpr int32_t kFlagShip = 1;    // flags bit 0: burning-ship fold
constexpr int32_t kFlagStrict = 2;  // flags bit 1: strict f32 orbit
// (flags bit 4 was the removed MH replay's bridge marker: MH deposits
// are kernel-recorded bins now — ops/pallas_kernels_mh.py — and never
// replay on the host.)

struct Canvas {
  int32_t w;
  int32_t h;
  double min_real;
  double min_imag;
  double delta_real;
  double delta_imag;
};

// Replay one block of <= kLanes samples. Orbits start at z = c
// (cudabrot.cu:323-324) and record every update including the escape point
// (cudabrot.cu:352-364); the loop is bounded by the classification-reported
// escape index instead of the reference's unbounded while(1).
template <bool kBurningShip, bool kStrict, typename HistT>
uint64_t ReplayBlock(const float* cr, const float* ci, const int32_t* iters,
                     int count, const Canvas& cv, HistT* hist,
                     uint64_t* points_total) {
  float zr[kLanes], zi[kLanes];
  int32_t limit[kLanes];
  for (int l = 0; l < kLanes; ++l) {
    const bool live = l < count;
    zr[l] = live ? cr[l] : 0.0f;
    zi[l] = live ? ci[l] : 0.0f;
    limit[l] = live ? iters[l] : -1;
  }
  int32_t max_iter = -1;
  for (int l = 0; l < count; ++l) {
    if (limit[l] > max_iter) max_iter = limit[l];
    if (limit[l] >= 0) *points_total += static_cast<uint64_t>(limit[l]) + 1;
  }

  const float min_r = static_cast<float>(cv.min_real);
  const float min_i = static_cast<float>(cv.min_imag);
  const float inv_dr = static_cast<float>(1.0 / cv.delta_real);
  const float inv_di = static_cast<float>(1.0 / cv.delta_imag);

  uint64_t hits = 0;
  int32_t idx[kLanes];
  for (int32_t s = 0; s <= max_iter; ++s) {
    // Vectorizable phase: update all lanes, quantize to bins.
#pragma GCC ivdep
    for (int l = 0; l < kLanes; ++l) {
      float r = zr[l], im = zi[l];
      if (kBurningShip) {
        r = r < 0 ? -r : r;
        im = im < 0 ? -im : im;
      }
      const float cre = l < count ? cr[l] : 0.0f;
      const float cim = l < count ? ci[l] : 0.0f;
      float nr, ni;
      if (kStrict) {
        // One rounding per op, matching the Pallas kernels' expression
        // shape exactly: nr = RN(RN(RN(r^2) - RN(im^2)) + cre),
        // ni = RN(RN(2r * im) + cim) (2r is exact). The barriers keep
        // gcc from substituting unrounded products into the adds (FMA
        // contraction); they also block auto-vectorization of this
        // lane loop — acceptable, this scalar block is only the
        // non-AVX512 fallback.
        float r2 = r * r;
        float i2 = im * im;
        float q = (2.0f * r) * im;
        ValueBarrier(r2);
        ValueBarrier(i2);
        ValueBarrier(q);
        nr = (r2 - i2) + cre;
        ni = q + cim;
      } else {
        nr = r * r - im * im + cre;
        ni = 2.0f * r * im + cim;
      }
      const bool rec = s <= limit[l];
      zr[l] = rec ? nr : zr[l];
      zi[l] = rec ? ni : zi[l];
      // Low-boundary guard before the truncating divide
      // (cudabrot.cu:305-310).
      const bool in_lo = nr >= min_r && ni >= min_i;
      const int32_t col = static_cast<int32_t>((nr - min_r) * inv_dr);
      const int32_t row = static_cast<int32_t>((ni - min_i) * inv_di);
      const bool ok =
          rec && in_lo && row >= 0 && row < cv.h && col >= 0 && col < cv.w;
      idx[l] = ok ? row * cv.w + col : -1;
    }
    // Scalar phase: histogram increments. Prefetch all lanes' cache
    // lines first so the read-modify-writes overlap their misses.
    for (int l = 0; l < kLanes; ++l) {
      if (idx[l] >= 0) __builtin_prefetch(&hist[idx[l]], 1, 1);
    }
    for (int l = 0; l < kLanes; ++l) {
      const int32_t b = idx[l];
      if (b >= 0) {
        ++hist[b];
        ++hits;
      }
    }
  }
  return hits;
}

constexpr int kLanesF64 = 8;  // replay width for the double (deep-zoom) path

// Double-precision replay block for extended-precision (deep-zoom)
// renders: the device classifies orbits in df32 (hi+lo float32, ~2^-48
// relative — cudabrot_tpu/ops/df32.py) and ships 24-bit sample-grid
// indices; the host reconstructs c in f64 (a strict superset of df32)
// and replays here entirely in hardware double, where canvas windows
// narrower than f32's ~1e-4 quantization floor stay sub-pixel. Same
// recording contract as ReplayBlock (orbits start at z = c and every
// update through the classified escape index is recorded).
template <bool kBurningShip, typename HistT>
uint64_t ReplayBlockF64(const double* cr, const double* ci,
                        const int32_t* iters, int count, const Canvas& cv,
                        HistT* hist, uint64_t* points_total) {
  double zr[kLanesF64], zi[kLanesF64];
  int32_t limit[kLanesF64];
  for (int l = 0; l < kLanesF64; ++l) {
    const bool live = l < count;
    zr[l] = live ? cr[l] : 0.0;
    zi[l] = live ? ci[l] : 0.0;
    limit[l] = live ? iters[l] : -1;
  }
  int32_t max_iter = -1;
  for (int l = 0; l < count; ++l) {
    if (limit[l] > max_iter) max_iter = limit[l];
    if (limit[l] >= 0) *points_total += static_cast<uint64_t>(limit[l]) + 1;
  }

  const double min_r = cv.min_real;
  const double min_i = cv.min_imag;
  const double inv_dr = 1.0 / cv.delta_real;
  const double inv_di = 1.0 / cv.delta_imag;

  uint64_t hits = 0;
  int32_t idx[kLanesF64];
  for (int32_t s = 0; s <= max_iter; ++s) {
#pragma GCC ivdep
    for (int l = 0; l < kLanesF64; ++l) {
      double r = zr[l], im = zi[l];
      if (kBurningShip) {
        r = r < 0 ? -r : r;
        im = im < 0 ? -im : im;
      }
      const double cre = l < count ? cr[l] : 0.0;
      const double cim = l < count ? ci[l] : 0.0;
      const double nr = r * r - im * im + cre;
      const double ni = 2.0 * r * im + cim;
      const bool rec = s <= limit[l];
      zr[l] = rec ? nr : zr[l];
      zi[l] = rec ? ni : zi[l];
      const bool in_lo = nr >= min_r && ni >= min_i;
      const int32_t col = static_cast<int32_t>((nr - min_r) * inv_dr);
      const int32_t row = static_cast<int32_t>((ni - min_i) * inv_di);
      const bool ok =
          rec && in_lo && row >= 0 && row < cv.h && col >= 0 && col < cv.w;
      idx[l] = ok ? row * cv.w + col : -1;
    }
    for (int l = 0; l < kLanesF64; ++l) {
      if (idx[l] >= 0) __builtin_prefetch(&hist[idx[l]], 1, 1);
    }
    for (int l = 0; l < kLanesF64; ++l) {
      const int32_t b = idx[l];
      if (b >= 0) {
        ++hist[b];
        ++hits;
      }
    }
  }
  return hits;
}

struct ThreadResult {
  uint64_t hits = 0;
  uint64_t points = 0;
};

#if defined(__AVX512F__)

// AVX-512 replay: kGroups independent 16-lane vectors advance together so
// the z-update dependency chains overlap. The generic ReplayBlock above
// ran fully scalar (the masking ternaries defeat autovectorization —
// measured 15 cycles/point); this path is the same math in explicit vector
// form. Orbit-point semantics match ReplayBlock exactly: z starts at c,
// every update through the escape point is recorded (cudabrot.cu:352-364),
// out-of-range points (including below-min, cudabrot.cu:305-310) are
// rejected before any divide/increment.
//
// The histogram increments are decoupled from the vector phase: each step
// compresses its on-canvas bin indices (vpcompressd) into a batch buffer,
// and a tight load/inc/store loop flushes the buffer when it fills. The
// round-1 bit-walk interleaved a vector store, per-lane scalar reloads of
// the same cache line (store-forward stalls), and branchy increments into
// every step; batching removes the stalls and lets the increment loop run
// at its own best IPC. Increment order within a flush equals lane order
// within step order — the same order the bit walk produced — and u32
// addition commutes, so the histogram is bit-identical either way.
constexpr int kGroups = 4;
constexpr int kLanesAvx = kGroups * 16;
//: Batch buffer: 4096 indices (16 KiB) — big enough to amortize the flush
//: loop's warmup, small enough to stay L1-resident.
constexpr int kBufCap = 4096;

struct IncBuf {
  alignas(64) int32_t idx[kBufCap];
  int n = 0;
};

template <bool kPrefetch, typename HistT>
inline void FlushIncrements(IncBuf& buf, HistT* hist) {
  const int32_t* b = buf.idx;
  const int n = buf.n;
  int i = 0;
  if (kPrefetch) {
    // Software lookahead only pays when the histogram exceeds the LLC
    // (the RMW would otherwise serialize on DRAM); on cache-resident
    // canvases the extra instructions are pure cost, so the sink
    // selects by histogram size.
    constexpr int kAhead = 24;
    for (; i < n - kAhead; ++i) {
      __builtin_prefetch(&hist[b[i + kAhead]], 1, 1);
      ++hist[b[i]];
    }
  }
  for (; i < n; ++i) ++hist[b[i]];
  buf.n = 0;
}

// Radix-partitioned accumulation for histograms far beyond the LLC.
// Direct (even prefetched) increments against a multi-GB histogram run
// at the DRAM random-RMW floor — measured 5.6e7 inc/s at 20000^2 on
// this host (csrc/bighist_bench.cpp, 4K pages) vs 1.5-1.6e8 inc/s for
// 64-band counting-sort passes whose per-band histogram slice
// (bins/64) stays LLC-resident while the partition passes stream.
// Bin ids buffer into a large trace; each full chunk (2^26 ids — the
// measured sweet spot, bigger chunks amortize nothing further) is
// counted, scattered band-contiguous into scratch, and applied
// band-by-band. Scratch is thread_local so its 512 MB faults once per
// worker thread, not once per pass.
constexpr int kBandBits = 6;
constexpr int kBands = 1 << kBandBits;
constexpr size_t kTraceCap = size_t{1} << 26;

template <typename HistT>
struct PartitionedAcc {
  std::vector<int32_t> trace;
  std::vector<int32_t> scratch;
  size_t n = 0;
  int shift = 0;
  HistT* hist = nullptr;

  void Begin(HistT* h, size_t bins) {
    hist = h;
    int bits = 0;
    while ((size_t{1} << bits) < bins) ++bits;
    shift = bits > kBandBits ? bits - kBandBits : 0;
    if (trace.empty()) {
      trace.resize(kTraceCap);
      scratch.resize(kTraceCap);
    }
  }

  void Append(IncBuf& buf) {
    if (n + static_cast<size_t>(buf.n) > kTraceCap) Apply();
    std::memcpy(trace.data() + n, buf.idx,
                static_cast<size_t>(buf.n) * sizeof(int32_t));
    n += static_cast<size_t>(buf.n);
    buf.n = 0;
  }

  void Apply() {
    if (n == 0) return;
    int64_t counts[kBands] = {0};
    const int32_t* b = trace.data();
    for (size_t i = 0; i < n; ++i) {
      ++counts[static_cast<uint32_t>(b[i]) >> shift];
    }
    int32_t* heads[kBands];
    int64_t off = 0;
    for (int k = 0; k < kBands; ++k) {
      heads[k] = scratch.data() + off;
      off += counts[k];
    }
    for (size_t i = 0; i < n; ++i) {
      const int32_t v = b[i];
      *heads[static_cast<uint32_t>(v) >> shift]++ = v;
    }
    const int32_t* s = scratch.data();
    HistT* h = hist;
    for (size_t i = 0; i < n; ++i) ++h[s[i]];
    n = 0;
  }
};

// Runtime increment sink: the replay blocks flush through this instead
// of committing to one strategy at compile time (the branch runs once
// per ~4K ids — negligible). Modes: 0 direct (LLC-resident), 1
// prefetched direct (above-LLC but slice-friendly), 2 radix-partitioned
// (multi-GB histograms).
template <typename HistT>
struct IncSink {
  HistT* hist = nullptr;
  int mode = 0;
  PartitionedAcc<HistT>* acc = nullptr;

  void Flush(IncBuf& buf) {
    if (mode == 2) {
      acc->Append(buf);
    } else if (mode == 1) {
      FlushIncrements<true>(buf, hist);
    } else {
      FlushIncrements<false>(buf, hist);
    }
  }

  void Done(IncBuf& buf) {
    Flush(buf);
    if (mode == 2) acc->Apply();
  }
};

// Pick the increment strategy from the histogram footprint: direct
// below a conservative LLC floor, prefetched direct above it, and
// radix-partitioned once the histogram dwarfs any LLC (measured
// crossover data in csrc/bighist_bench.cpp). The partitioned
// accumulator's scratch is thread_local: the host replay worker calls
// from one long-lived thread, so the 512 MB faults once per render,
// and the big-canvas thread cap (ReplayScatterImpl) keeps multi-thread
// calls on the direct path's private histograms.
template <typename HistT>
IncSink<HistT> MakeSink(const Canvas& cv, HistT* hist) {
  const size_t bins = static_cast<size_t>(cv.w) * cv.h;
  const size_t bytes = bins * sizeof(HistT);
  IncSink<HistT> sink;
  sink.hist = hist;
  if (bytes > (size_t{256} << 20)) {
    static thread_local PartitionedAcc<HistT> acc;
    acc.Begin(hist, bins);
    sink.mode = 2;
    sink.acc = &acc;
  } else if (bytes > (size_t{16} << 20)) {
    sink.mode = 1;
  }
  return sink;
}

template <bool kBurningShip, bool kStrict, typename HistT>
uint64_t ReplayBlockAvx(const float* cr, const float* ci,
                        const int32_t* iters, int count, const Canvas& cv,
                        IncSink<HistT>& sink, uint64_t* points_total,
                        IncBuf& buf) {
  __m512 vzr[kGroups], vzi[kGroups], vcr[kGroups], vci[kGroups];
  __m512i vlim[kGroups];
  int32_t gmax[kGroups], gmin[kGroups];
  int32_t max_iter = -1;
  for (int g = 0; g < kGroups; ++g) {
    const int base = g * 16;
    const int live_n = count - base;
    const __mmask16 live =
        live_n >= 16 ? static_cast<__mmask16>(0xFFFF)
                     : static_cast<__mmask16>((1u << (live_n < 0 ? 0 : live_n)) - 1);
    vcr[g] = _mm512_maskz_loadu_ps(live, cr + base);
    vci[g] = _mm512_maskz_loadu_ps(live, ci + base);
    vzr[g] = vcr[g];
    vzi[g] = vci[g];
    // Dead lanes get limit = -1 so `s <= limit` never records them.
    vlim[g] = _mm512_mask_loadu_epi32(_mm512_set1_epi32(-1), live,
                                      iters + base);
    gmax[g] = _mm512_reduce_max_epi32(vlim[g]);
    // While s <= gmin every lane of the group is still recording, so the
    // per-step rec mask and masked state blends are skipped entirely.
    // Any dead lane makes gmin = -1, which disables the fast regime for
    // the group (dead lanes carry z = c = 0, whose bin IS on-canvas).
    // Sorted descending input keeps blocks length-homogeneous, so most
    // steps run in the fast regime.
    gmin[g] = _mm512_reduce_min_epi32(vlim[g]);
    if (gmax[g] > max_iter) max_iter = gmax[g];
  }
  for (int l = 0; l < count; ++l) {
    if (iters[l] >= 0) *points_total += static_cast<uint64_t>(iters[l]) + 1;
  }

  const __m512 min_r = _mm512_set1_ps(static_cast<float>(cv.min_real));
  const __m512 min_i = _mm512_set1_ps(static_cast<float>(cv.min_imag));
  const __m512 inv_dr = _mm512_set1_ps(static_cast<float>(1.0 / cv.delta_real));
  const __m512 inv_di = _mm512_set1_ps(static_cast<float>(1.0 / cv.delta_imag));
  const __m512i vw = _mm512_set1_epi32(cv.w);
  const __m512i vh = _mm512_set1_epi32(cv.h);
  const __m512 sign_clear = _mm512_castsi512_ps(_mm512_set1_epi32(0x7FFFFFFF));

  uint64_t hits = 0;
  for (int32_t s = 0; s <= max_iter; ++s) {
    const __m512i vs = _mm512_set1_epi32(s);
    for (int g = 0; g < kGroups; ++g) {
      if (s > gmax[g]) continue;  // sorted input: whole group finished
      __m512 r = vzr[g], im = vzi[g];
      if (kBurningShip) {
        r = _mm512_and_ps(r, sign_clear);
        im = _mm512_and_ps(im, sign_clear);
      }
      // (r+r)*im computes RN(2*r*im) exactly like the kernels'
      // 2.0*zr*zi (the doubling is exact); in strict mode the barriers
      // pin the rounded products so gcc cannot contract the mul+add
      // pairs into FMAs (it fuses straight through these intrinsics —
      // they lower to plain MULT/PLUS in GIMPLE).
      __m512 r2 = _mm512_mul_ps(r, r);
      __m512 i2 = _mm512_mul_ps(im, im);
      __m512 q = _mm512_mul_ps(_mm512_add_ps(r, r), im);
      if (kStrict) {
        ValueBarrier(r2);
        ValueBarrier(i2);
        ValueBarrier(q);
      }
      const __m512 nr = _mm512_add_ps(_mm512_sub_ps(r2, i2), vcr[g]);
      const __m512 ni = _mm512_add_ps(q, vci[g]);
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
      // Floor-convert, then one unsigned compare per axis: floor sends
      // below-min fractions to -1 (the truncate path needed a separate
      // >= min guard to catch them, cudabrot.cu:305-310), and as unsigned
      // any negative — or saturated 0x80000000 from NaN/huge — exceeds
      // the canvas bound. Accepted values are >= 0, where floor and the
      // reference's truncating divide agree, so the accepted bin set is
      // bit-identical to the guarded-truncate path.
      const __m512i col = _mm512_cvt_roundps_epi32(
          _mm512_mul_ps(_mm512_sub_ps(nr, min_r), inv_dr),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      const __m512i row = _mm512_cvt_roundps_epi32(
          _mm512_mul_ps(_mm512_sub_ps(ni, min_i), inv_di),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      __mmask16 ok = _mm512_mask_cmplt_epu32_mask(rec, col, vw);
      ok = _mm512_mask_cmplt_epu32_mask(ok, row, vh);
      const __m512i idx =
          _mm512_add_epi32(_mm512_mullo_epi32(row, vw), col);
      _mm512_mask_compressstoreu_epi32(buf.idx + buf.n, ok, idx);
      const int c = __builtin_popcount(static_cast<unsigned>(ok));
      buf.n += c;
      hits += static_cast<uint64_t>(c);
    }
    if (buf.n > kBufCap - kLanesAvx) sink.Flush(buf);
  }
  return hits;
}

#endif  // __AVX512F__

#if defined(__AVX512F__) && defined(__AVX512VL__)

// AVX-512 double replay for extended-precision (deep-zoom) renders:
// same structure as ReplayBlockAvx with 8-lane pd vectors (VL for the
// 256-bit index compress/masked ops — present on every AVX512F server
// part since Skylake-SP). Semantics match ReplayBlockF64: f64 orbit
// math, f64 binning bounds. The scalar block measured ~1.5e8 pts/s and
// was the binding rate of the deep-zoom bench line (worker_replay ==
// wall); this path exists to lift that wall.
constexpr int kGroupsF64 = 4;
constexpr int kLanesF64Avx = kGroupsF64 * 8;

template <bool kBurningShip, typename HistT>
uint64_t ReplayBlockAvxF64(const double* cr, const double* ci,
                           const int32_t* iters, int count, const Canvas& cv,
                           IncSink<HistT>& sink, uint64_t* points_total,
                           IncBuf& buf) {
  __m512d vzr[kGroupsF64], vzi[kGroupsF64], vcr[kGroupsF64], vci[kGroupsF64];
  __m256i vlim[kGroupsF64];
  int32_t gmax[kGroupsF64], gmin[kGroupsF64];
  int32_t max_iter = -1;
  for (int g = 0; g < kGroupsF64; ++g) {
    const int base = g * 8;
    const int live_n = count - base;
    const __mmask8 live =
        live_n >= 8 ? static_cast<__mmask8>(0xFF)
                    : static_cast<__mmask8>(
                          (1u << (live_n < 0 ? 0 : live_n)) - 1);
    vcr[g] = _mm512_maskz_loadu_pd(live, cr + base);
    vci[g] = _mm512_maskz_loadu_pd(live, ci + base);
    vzr[g] = vcr[g];
    vzi[g] = vci[g];
    vlim[g] = _mm256_mask_loadu_epi32(_mm256_set1_epi32(-1), live,
                                      iters + base);
    alignas(32) int32_t lim[8];
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(lim), vlim[g]);
    int32_t mx = lim[0], mn = lim[0];
    for (int l = 1; l < 8; ++l) {
      if (lim[l] > mx) mx = lim[l];
      if (lim[l] < mn) mn = lim[l];
    }
    gmax[g] = mx;
    gmin[g] = mn;
    if (mx > max_iter) max_iter = mx;
  }
  for (int l = 0; l < count; ++l) {
    if (iters[l] >= 0) *points_total += static_cast<uint64_t>(iters[l]) + 1;
  }

  const __m512d min_r = _mm512_set1_pd(cv.min_real);
  const __m512d min_i = _mm512_set1_pd(cv.min_imag);
  const __m512d inv_dr = _mm512_set1_pd(1.0 / cv.delta_real);
  const __m512d inv_di = _mm512_set1_pd(1.0 / cv.delta_imag);
  const __m256i vw = _mm256_set1_epi32(cv.w);
  const __m256i vh = _mm256_set1_epi32(cv.h);
  const __m512d sign_clear = _mm512_castsi512_pd(
      _mm512_set1_epi64(0x7FFFFFFFFFFFFFFFll));

  uint64_t hits = 0;
  for (int32_t s = 0; s <= max_iter; ++s) {
    const __m256i vs = _mm256_set1_epi32(s);
    for (int g = 0; g < kGroupsF64; ++g) {
      if (s > gmax[g]) continue;  // sorted input: whole group finished
      __m512d r = vzr[g], im = vzi[g];
      if (kBurningShip) {
        r = _mm512_and_pd(r, sign_clear);
        im = _mm512_and_pd(im, sign_clear);
      }
      const __m512d nr = _mm512_add_pd(
          _mm512_sub_pd(_mm512_mul_pd(r, r), _mm512_mul_pd(im, im)),
          vcr[g]);
      const __m512d ni = _mm512_add_pd(
          _mm512_mul_pd(_mm512_add_pd(r, r), im), vci[g]);
      __mmask8 rec;
      if (s <= gmin[g]) {
        vzr[g] = nr;
        vzi[g] = ni;
        rec = static_cast<__mmask8>(0xFF);
      } else {
        rec = _mm256_cmple_epi32_mask(vs, vlim[g]);
        vzr[g] = _mm512_mask_mov_pd(vzr[g], rec, nr);
        vzi[g] = _mm512_mask_mov_pd(vzi[g], rec, ni);
      }
      // Floor-convert + unsigned bound checks: identical accepted-bin
      // set to the guarded-truncate scalar path (see ReplayBlockAvx).
      const __m256i col = _mm512_cvt_roundpd_epi32(
          _mm512_mul_pd(_mm512_sub_pd(nr, min_r), inv_dr),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      const __m256i row = _mm512_cvt_roundpd_epi32(
          _mm512_mul_pd(_mm512_sub_pd(ni, min_i), inv_di),
          _MM_FROUND_TO_NEG_INF | _MM_FROUND_NO_EXC);
      __mmask8 ok = _mm256_mask_cmplt_epu32_mask(rec, col, vw);
      ok = _mm256_mask_cmplt_epu32_mask(ok, row, vh);
      const __m256i idx =
          _mm256_add_epi32(_mm256_mullo_epi32(row, vw), col);
      _mm256_mask_compressstoreu_epi32(buf.idx + buf.n, ok, idx);
      const int c = __builtin_popcount(static_cast<unsigned>(ok));
      buf.n += c;
      hits += static_cast<uint64_t>(c);
    }
    if (buf.n > kBufCap - kLanesF64Avx) sink.Flush(buf);
  }
  return hits;
}

#endif  // __AVX512F__ && __AVX512VL__

template <bool kBurningShip, bool kStrict, typename HistT>
void ReplayRange(const float* cr, const float* ci, const int32_t* iters,
                 int64_t begin, int64_t end, const Canvas& cv, HistT* hist,
                 ThreadResult* out) {
#if defined(__AVX512F__)
  IncBuf buf;
  IncSink<HistT> sink = MakeSink(cv, hist);
  for (int64_t i = begin; i < end; i += kLanesAvx) {
    const int count =
        static_cast<int>(end - i < kLanesAvx ? end - i : kLanesAvx);
    out->hits += ReplayBlockAvx<kBurningShip, kStrict>(
        cr + i, ci + i, iters + i, count, cv, sink, &out->points, buf);
  }
  sink.Done(buf);
#else
  for (int64_t i = begin; i < end; i += kLanes) {
    const int count = static_cast<int>(end - i < kLanes ? end - i : kLanes);
    out->hits += ReplayBlock<kBurningShip, kStrict>(
        cr + i, ci + i, iters + i, count, cv, hist, &out->points);
  }
#endif
}

// Double-precision range loop (deep-zoom replay). Scalar blocks only:
// extended-precision bands are emission-light (few, long orbits), so the
// f64 path has never been the bottleneck; an AVX-512 pd variant mirrors
// ReplayBlockAvx if that changes.
template <bool kBurningShip, typename HistT>
void ReplayRange(const double* cr, const double* ci, const int32_t* iters,
                 int64_t begin, int64_t end, const Canvas& cv, HistT* hist,
                 ThreadResult* out) {
#if defined(__AVX512F__) && defined(__AVX512VL__)
  IncBuf buf;
  IncSink<HistT> sink = MakeSink(cv, hist);
  for (int64_t i = begin; i < end; i += kLanesF64Avx) {
    const int count =
        static_cast<int>(end - i < kLanesF64Avx ? end - i : kLanesF64Avx);
    out->hits += ReplayBlockAvxF64<kBurningShip>(
        cr + i, ci + i, iters + i, count, cv, sink, &out->points, buf);
  }
  sink.Done(buf);
#else
  for (int64_t i = begin; i < end; i += kLanesF64) {
    const int count =
        static_cast<int>(end - i < kLanesF64 ? end - i : kLanesF64);
    out->hits += ReplayBlockF64<kBurningShip>(cr + i, ci + i, iters + i,
                                              count, cv, hist, &out->points);
  }
#endif
}

// Shared implementation for the uint32/uint64 histogram entry points,
// templated over the sample precision (float for the production f32
// payloads, double for extended-precision deep-zoom replay).
template <typename HistT, typename SampleT>
int64_t ReplayScatterImpl(const SampleT* cr, const SampleT* ci,
                          const int32_t* iters, int64_t n, int32_t w,
                          int32_t h, double min_real, double min_imag,
                          double delta_real, double delta_imag, int32_t flags,
                          int32_t num_threads, HistT* hist,
                          uint64_t* points_total) {
  if (n <= 0 || w <= 0 || h <= 0) return 0;
  const Canvas cv{w, h, min_real, min_imag, delta_real, delta_imag};
  const bool ship = (flags & kFlagShip) != 0;
  const bool strict = (flags & kFlagStrict) != 0;

  int threads = num_threads;
  if (threads <= 0) {
    threads = static_cast<int>(std::thread::hardware_concurrency());
    if (threads <= 0) threads = 1;
  }
  const int64_t min_per_thread = 1024;
  if (n / min_per_thread < threads) {
    threads = static_cast<int>(n / min_per_thread);
    if (threads < 1) threads = 1;
  }
  if (threads > 1) {
    // Per-call private-histogram economics: each extra thread costs one
    // bins-sized alloc+zero plus a serial merge pass (~2e9 bins/s
    // streaming), while replay parallelism saves ~P/(rate*N) at a
    // conservative DRAM-bound ~1e8 pts/s/thread. Cap at the optimum of
    // t(N) = P/(rate*N) + bins*(N-1)/merge_rate so a ~100-core host
    // doesn't pay ~99 private 1.2 GB histograms (transient OOM + a
    // minute of serial merging) for a batch three threads saturate.
    // Histogram totals are unchanged (integer addition commutes).
    uint64_t est_points = 0;
    for (int64_t i = 0; i < n; ++i) {
      if (iters[i] >= 0) est_points += static_cast<uint64_t>(iters[i]) + 1;
    }
    const double bins_d = static_cast<double>(w) * static_cast<double>(h);
    const double n_opt =
        std::sqrt(static_cast<double>(est_points) * 2e9 / (1e8 * bins_d));
    int cap = static_cast<int>(n_opt) + 1;
    if (cap < 1) cap = 1;
    if (threads > cap) threads = cap;
  }

  std::vector<ThreadResult> results(threads);
  // One range dispatcher so the strict bit is resolved in exactly one
  // place. The f64 overload has no strict variant (see ValueBarrier
  // notes); the bit is ignored there.
  auto run = [&](int64_t b, int64_t e, HistT* th, ThreadResult* res) {
    if constexpr (std::is_same<SampleT, float>::value) {
      if (ship) {
        if (strict) {
          ReplayRange<true, true>(cr, ci, iters, b, e, cv, th, res);
        } else {
          ReplayRange<true, false>(cr, ci, iters, b, e, cv, th, res);
        }
      } else {
        if (strict) {
          ReplayRange<false, true>(cr, ci, iters, b, e, cv, th, res);
        } else {
          ReplayRange<false, false>(cr, ci, iters, b, e, cv, th, res);
        }
      }
    } else {
      if (ship) {
        ReplayRange<true>(cr, ci, iters, b, e, cv, th, res);
      } else {
        ReplayRange<false>(cr, ci, iters, b, e, cv, th, res);
      }
    }
  };
  if (threads == 1) {
    run(0, n, hist, &results[0]);
  } else {
    // Per-thread private histograms: deterministic, no atomics.
    const size_t bins = static_cast<size_t>(w) * h;
    std::vector<std::vector<HistT>> priv(threads - 1,
                                         std::vector<HistT>(bins, 0));
    std::vector<std::thread> pool;
    const int64_t chunk = (n + threads - 1) / threads;
    for (int t = 1; t < threads; ++t) {
      const int64_t b = t * chunk;
      const int64_t e = std::min<int64_t>(n, b + chunk);
      HistT* th = priv[t - 1].data();
      ThreadResult* res = &results[t];
      pool.emplace_back([=] { run(b, e, th, res); });
    }
    run(0, std::min<int64_t>(n, chunk), hist, &results[0]);
    for (auto& th : pool) th.join();
    for (int t = 1; t < threads; ++t) {
      const HistT* src = priv[t - 1].data();
      for (size_t i = 0; i < bins; ++i) hist[i] += src[i];
    }
  }

  uint64_t hits = 0, points = 0;
  for (const auto& r : results) {
    hits += r.hits;
    points += r.points;
  }
  if (points_total) *points_total = points;
  return static_cast<int64_t>(hits);
}

uint32_t crc_table[256];
bool crc_table_ready = false;

void InitCrcTable() {
  for (uint32_t n = 0; n < 256; ++n) {
    uint32_t c = n;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[n] = c;
  }
  crc_table_ready = true;
}

}  // namespace

extern "C" {

// Replays `n` known-escaping samples into `hist` (h*w uint32, row-major).
// `flags` bit 0: burning-ship fold. Negative `iters` entries are skipped
// (invalid/padding lanes from the device compaction). Returns the number
// of on-canvas increments; `points_total` (optional) receives the total
// orbit points including off-canvas ones.
int64_t tpubrot_replay_scatter(const float* cr, const float* ci,
                               const int32_t* iters, int64_t n, int32_t w,
                               int32_t h, double min_real, double min_imag,
                               double delta_real, double delta_imag,
                               int32_t flags, int32_t num_threads,
                               uint32_t* hist, uint64_t* points_total) {
  return ReplayScatterImpl(cr, ci, iters, n, w, h, min_real, min_imag,
                           delta_real, delta_imag, flags, num_threads, hist,
                           points_total);
}

// uint64 histogram variant: identical semantics with a 64-bit accumulation
// buffer, for extreme-duration renders whose hottest bins would overflow
// uint32 (the reference is uint32-only, cudabrot.cu:105-108).
int64_t tpubrot_replay_scatter64(const float* cr, const float* ci,
                                 const int32_t* iters, int64_t n, int32_t w,
                                 int32_t h, double min_real, double min_imag,
                                 double delta_real, double delta_imag,
                                 int32_t flags, int32_t num_threads,
                                 uint64_t* hist, uint64_t* points_total) {
  return ReplayScatterImpl(cr, ci, iters, n, w, h, min_real, min_imag,
                           delta_real, delta_imag, flags, num_threads, hist,
                           points_total);
}

// Double-precision sample variants for extended-precision (deep-zoom)
// renders: identical semantics to tpubrot_replay_scatter with f64
// samples and f64 iteration/binning arithmetic. The engine reconstructs
// each c in f64 from the device's 24-bit sample-grid indices
// (cudabrot_tpu/engines/host_replay.py grid decode).
int64_t tpubrot_replay_scatter_f64(const double* cr, const double* ci,
                                   const int32_t* iters, int64_t n, int32_t w,
                                   int32_t h, double min_real, double min_imag,
                                   double delta_real, double delta_imag,
                                   int32_t flags, int32_t num_threads,
                                   uint32_t* hist, uint64_t* points_total) {
  return ReplayScatterImpl(cr, ci, iters, n, w, h, min_real, min_imag,
                           delta_real, delta_imag, flags, num_threads, hist,
                           points_total);
}

int64_t tpubrot_replay_scatter_f64_64(const double* cr, const double* ci,
                                      const int32_t* iters, int64_t n,
                                      int32_t w, int32_t h, double min_real,
                                      double min_imag, double delta_real,
                                      double delta_imag, int32_t flags,
                                      int32_t num_threads, uint64_t* hist,
                                      uint64_t* points_total) {
  return ReplayScatterImpl(cr, ci, iters, n, w, h, min_real, min_imag,
                           delta_real, delta_imag, flags, num_threads, hist,
                           points_total);
}

// 16-bit binary PGM writer: P5 header + big-endian pixels
// (SaveImage parity, cudabrot.cu:548-577, endian-correct on any host).
int32_t tpubrot_write_pgm16(const char* path, const uint16_t* data, int32_t w,
                            int32_t h) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  if (std::fprintf(f, "P5\n%d %d\n%d\n", w, h, 0xffff) <= 0) {
    std::fclose(f);
    return -2;
  }
  const size_t total = static_cast<size_t>(w) * h;
  constexpr size_t kChunk = 1 << 16;
  std::vector<uint16_t> buf(kChunk);
  for (size_t off = 0; off < total; off += kChunk) {
    const size_t m = std::min(kChunk, total - off);
    for (size_t i = 0; i < m; ++i) {
      const uint16_t v = data[off + i];
      buf[i] = static_cast<uint16_t>((v << 8) | (v >> 8));
    }
    if (std::fwrite(buf.data(), sizeof(uint16_t), m, f) != m) {
      std::fclose(f);
      return -3;
    }
  }
  if (std::fclose(f) != 0) return -4;
  return 0;
}

// Atomic write: tmp file in the same directory + fsync + rename, so a
// crash mid-save never corrupts an existing checkpoint (the reference
// truncates in place, cudabrot.cu:266).
int32_t tpubrot_write_file_atomic(const char* path, const char* data,
                                  uint64_t len) {
  std::string tmp(path);
  tmp += ".tmpXXXXXX";
  std::vector<char> tmpl(tmp.begin(), tmp.end());
  tmpl.push_back('\0');
  const int fd = mkstemp(tmpl.data());
  if (fd < 0) return -1;
  uint64_t off = 0;
  while (off < len) {
    const ssize_t rc = write(fd, data + off, len - off);
    if (rc <= 0) {
      close(fd);
      unlink(tmpl.data());
      return -2;
    }
    off += static_cast<uint64_t>(rc);
  }
  if (fsync(fd) != 0 || close(fd) != 0) {
    unlink(tmpl.data());
    return -3;
  }
  if (rename(tmpl.data(), path) != 0) {
    unlink(tmpl.data());
    return -4;
  }
  return 0;
}

uint32_t tpubrot_crc32(const char* data, uint64_t len) {
  if (!crc_table_ready) InitCrcTable();
  uint32_t c = 0xFFFFFFFFu;
  for (uint64_t i = 0; i < len; ++i) {
    c = crc_table[(c ^ static_cast<uint8_t>(data[i])) & 0xFF] ^ (c >> 8);
  }
  return c ^ 0xFFFFFFFFu;
}

}  // extern "C"
