"""Host-side orbit replay pipeline.

The accelerator classifies; the host replays. Each pass's compacted
in-band emission batch (12 bytes/sample) is fetched from the device and
fed to the native C++ replay engine (csrc/tpubrot_native.cpp) on a worker
thread, so the histogram accumulation runs *concurrently* with the next
classify pass — the TPU never waits on scatter (which has no hardware
path on TPU, benchmarks/PERF_NOTES.md). ctypes releases the GIL during
the native call, so the worker genuinely overlaps Python-side dispatch.

Ordering note: histogram addition commutes, so jobs need no ordering —
the queue is bounded only to apply back-pressure when the host falls
behind. Accumulation is deterministic for a fixed pass sequence.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import time

import numpy as np

from cudabrot_tpu.config import Canvas
from cudabrot_tpu.io import native


def alloc_hist(shape, dtype) -> np.ndarray:
    """Host histogram allocation with transparent-huge-page backing.

    A multi-GB histogram on 4 KiB pages misses the TLB on essentially
    every random increment; MADV_HUGEPAGE backing alone measured
    5.6e7 -> 9.2e7 inc/s at 20000^2 on this host, and the native
    radix-partitioned accumulation on top reaches 1.5-1.6e8
    (csrc/bighist_bench.cpp). Small histograms keep plain numpy
    allocation — THP would only waste alignment padding there."""
    n = 1
    for s in shape:
        n *= int(s)
    nbytes = n * np.dtype(dtype).itemsize
    if nbytes < (64 << 20):
        return np.zeros(shape, dtype)
    import ctypes
    import mmap

    align = 2 << 20
    # MAP_PRIVATE is load-bearing: python's default is MAP_SHARED, and
    # anonymous THP only backs private mappings (shmem THP is a separate
    # knob, "never" on this host).
    buf = mmap.mmap(
        -1, nbytes + align, flags=mmap.MAP_PRIVATE | mmap.MAP_ANONYMOUS
    )
    addr = ctypes.addressof(ctypes.c_char.from_buffer(buf))
    off = (-addr) % align
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        libc.madvise(
            ctypes.c_void_p(addr + off),
            ctypes.c_size_t(nbytes),
            ctypes.c_int(14),  # MADV_HUGEPAGE
        )
    except OSError:  # pragma: no cover - madvise is advisory anyway
        pass
    # Anonymous mmap pages are zero-filled; no memset needed (first
    # touch faults them in as huge pages thanks to the advice above).
    return np.frombuffer(buf, dtype=dtype, count=n, offset=off).reshape(
        shape
    )


def mh_deposit_numpy(hist: np.ndarray, bins, t, rep) -> tuple[int, int]:
    """Apply MH tenure deposits to a host histogram.

    The exact-u64 twin of ops/binning.mh_scatter (see there for the
    weight accounting): ``bins`` i32 (V, N) kernel-recorded visit bins,
    ``t``/``rep`` i32 (N,). Returns (hits, deposits) — total deposited
    mass in 1/WEIGHT_SCALE units and recorded-bin count. Both paths
    compute floor(v * rep * 65536 / t) spread by the same Bresenham, so
    host and device deposits agree exactly."""
    visit_slots = bins.shape[0]
    valid = np.asarray(t) > 1
    if not valid.any():
        return 0, 0
    t64 = np.asarray(t)[valid].astype(np.uint64)
    v = (t64 - 1) // 256
    rep64 = np.asarray(rep)[valid].astype(np.uint64)
    q = (v * rep64 * 65536) // t64
    n = np.minimum(v, np.uint64(visit_slots))
    k = np.arange(visit_slots + 1, dtype=np.uint64)[:, None]
    kk = np.minimum(k, n[None])
    pref = (kk * q[None]) // n[None]
    d = pref[1:] - pref[:-1]
    mask = np.arange(visit_slots, dtype=np.uint64)[:, None] < n[None]
    b = np.asarray(bins)[:, valid]
    flat = hist.reshape(-1)
    np.add.at(flat, b[mask], d[mask].astype(hist.dtype))
    return int(d.sum()), int(mask.sum())


class HostReplayWorker:
    """Single background worker feeding the native replay engine."""

    def __init__(
        self,
        canvas: Canvas,
        *,
        burning_ship: bool,
        num_threads: int = 0,
        max_queue: int = 3,
        dtype=np.uint32,
        grid_decode: tuple | None = None,
        mh_bins: int | None = None,
        strict: bool = False,
    ):
        #: Use the contraction-proof native f32 orbit variant, which
        #: bit-matches Mosaic-compiled (TPU) classify kernels. The
        #: engine sets this for TPU-classified payloads whose estimator
        #: couples kernel-side selection to replay deposits (MH
        #: acceptance, canvas emit filter); CPU-compiled kernels keep
        #: the contracted default, which bit-matches XLA's CPU emitter
        #: (csrc/tpubrot_native.cpp "strict"; benchmarks/fma_probe.py).
        self.strict = strict
        #: Metropolis-Hastings payload mode: the number of visit-bin
        #: rows (visit_slots). Payload rows are i32
        #: [iters, rep, t, bin_0..bin_{V-1}] — kernel-recorded canvas
        #: bins, applied with mh_deposit_numpy (no replay of any kind;
        #: the kernel's own trajectory already binned its visits).
        #: None = uniform sampling.
        self.mh_bins = mh_bins
        #: MH: retained for stat compatibility — the bins deposit
        #: conserves tenure mass by construction, so this stays 0.
        self.lost_weight = 0
        #: Extended-precision (deep-zoom) payload decode parameters
        #: (center_r64, center_i64, step_r32, step_i32): payload rows
        #: carry 24-bit sample-window grid indices instead of f32 c
        #: values, reconstructed here in f64 and replayed through the
        #: native double path (csrc ReplayBlockF64). None = f32 mode.
        self.grid_decode = grid_decode
        if not native.available():
            raise RuntimeError(
                "native replay library unavailable (build with `make -C csrc`)"
            )
        self.canvas = canvas
        self.burning_ship = burning_ship
        self.max_queue = max_queue
        # uint64 bins for extreme-duration renders (EngineOptions
        # .hist_dtype); the native engine has entry points for both.
        # THP-backed at production sizes (alloc_hist).
        self.hist = alloc_hist(canvas.shape, dtype)
        self.hits = 0
        self.points = 0
        #: Cumulative seconds the worker spent fetching payloads vs
        #: replaying (diagnostics; surfaced via engine stats).
        self.fetch_seconds = 0.0
        self.replay_seconds = 0.0
        # Two-stage pipeline on multi-core hosts: fetch (device->host
        # materialization + decode) and replay run on separate threads so
        # fetch(p+1) overlaps replay(p). copy_to_host_async does not
        # reliably prefetch through every transport (measured: this
        # environment's tunnel pays the full transfer inside np.asarray),
        # so on a single thread the stages serialize — at the
        # emission-heavy default band that cost ~45% of the pass wall.
        # The transfer is CPU-bound on tunneled transports, though, so on
        # a ONE-core host the split only adds contention (measured -13%)
        # — both stages then share a single worker thread.
        import os

        # sched_getaffinity sees cgroup/affinity limits (a container pinned
        # to one core would otherwise enable the split and pay the measured
        # ~13% contention penalty); cpu_count is the portable fallback.
        try:
            cores = len(os.sched_getaffinity(0))
        except (AttributeError, OSError):
            cores = os.cpu_count() or 1
        # Resolve auto (0) threads here rather than in the native library:
        # its hardware_concurrency() fallback ignores cgroup/affinity
        # limits, this count doesn't. Real v5e hosts have ~100 cores; the
        # native engine splits the batch across per-thread private
        # histograms and merges serially (csrc/tpubrot_native.cpp).
        self.num_threads = num_threads if num_threads > 0 else cores
        self._pipelined = cores > 1
        self._fetch_pool = (
            cf.ThreadPoolExecutor(max_workers=1) if self._pipelined else None
        )
        self._pool = cf.ThreadPoolExecutor(max_workers=1)
        self._pending: collections.deque[cf.Future] = collections.deque()

    def submit(self, n_valid, payload) -> None:
        """Queue one emission batch. ``payload`` is one of: a (2, K)
        u32 device array of packed emissions (24-bit RNG index per axis
        + split 16-bit iters+1; see pallas_engine's host_pass), the
        (3, K) f32 layout [cr; ci; iters-as-f32] (also used for
        extended-precision window-grid indices), or the (5, K) f32 MH
        layout [k_re; k_im; iters; rep; v]. Only the first ``n_valid``
        columns are live. Multi-device engines pass stacked
        (D, C, K) payloads; multi-process engines pass a *list* of the
        process's addressable (d_local, C, K) shards (plus the matching
        n_valid list)."""
        while len(self._pending) >= self.max_queue:
            self._pending.popleft().result()
        if self._pipelined:
            fetched = self._fetch_pool.submit(self._fetch, n_valid, payload)
            self._pending.append(self._pool.submit(self._replay, fetched))
        else:
            self._pending.append(
                self._pool.submit(self._job, n_valid, payload)
            )

    def _job(self, n_valid, payload) -> None:
        """Single-thread path: fetch and replay chained on one worker."""
        done: cf.Future = cf.Future()
        done.set_result(self._fetch(n_valid, payload))
        self._replay(done)

    def _fetch(self, n_valid, payload):
        # Materializing the device values blocks until the pass producing
        # them has finished — by then the engine has already dispatched
        # the next pass, so the device keeps working while we replay. The
        # payload is fetched whole: it is an existing pass output, so the
        # transfer needs no new device computation (anything dispatched
        # here would queue behind the in-flight pass); keeping it small is
        # the capacity model's job. Invalid lanes carry iters == -1 and
        # cost the native engine nothing.
        t0 = time.perf_counter()
        if isinstance(n_valid, (list, tuple)):
            n = sum(int(np.asarray(x).sum()) for x in n_valid)
        else:
            n = int(np.asarray(n_valid).sum())
        if n <= 0:
            self.fetch_seconds += time.perf_counter() - t0
            return None
        if isinstance(payload, (list, tuple)):
            # Per-shard payloads from a multi-process engine: fold each
            # shard's device axis and stack them — (sum_d, C, K).
            parts = [np.asarray(p) for p in payload]
            batch = np.concatenate(
                [p.reshape((-1,) + p.shape[-2:]) for p in parts], axis=0
            )
        else:
            batch = np.asarray(payload)
        if batch.ndim == 3:
            # Stacked multi-device payloads (D, C, K) from the
            # data-parallel host-replay engine: fold the device axis into
            # the lane axis — replay order is irrelevant (addition
            # commutes) and invalid lanes cost nothing.
            batch = np.concatenate(list(batch), axis=1)
        if self.mh_bins is not None:
            # MH payload: i32 rows [iters, rep, t, bin_0..bin_{V-1}].
            batch = batch.astype(np.int32, copy=False)
            reps = batch[1]
            vks = batch[2]
            bins = batch[3:]
            self.fetch_seconds += time.perf_counter() - t0
            return reps, vks, bins
        if batch.dtype == np.uint32:
            # Packed layout: exact c reconstruction (k * 2^-22 - 2 is the
            # kernel's own sample quantization, bit-identical round trip).
            w0, w1 = batch[0], batch[1]
            k_r = (w0 & 0xFFFFFF).astype(np.float32)
            k_i = (w1 & 0xFFFFFF).astype(np.float32)
            cr = k_r * np.float32(2.384185791015625e-07) - np.float32(2.0)
            ci = k_i * np.float32(2.384185791015625e-07) - np.float32(2.0)
            enc = (w0 >> 24) | ((w1 >> 24) << 8)
            iters = enc.astype(np.int32) - 1
        elif self.grid_decode is not None:
            # Extended-precision payload: rows are 24-bit sample-window
            # grid indices (exact in f32). Reconstruct the f32 window
            # offset exactly as the classify kernel computed it (one f32
            # rounding — pallas_kernels_ext._make_kernel_ext), then add
            # it to the f64 window center: agrees with the kernel's df32
            # c to ~2^-48, the documented replay contract.
            c_r64, c_i64, step_r, step_i = self.grid_decode
            batch = batch.astype(np.float32, copy=False)
            two23 = np.float32(8388608.0)
            off_r = (batch[0] - two23) * np.float32(step_r)
            off_i = (batch[1] - two23) * np.float32(step_i)
            cr = c_r64 + off_r.astype(np.float64)
            ci = c_i64 + off_i.astype(np.float64)
            iters = batch[2].astype(np.int32)
        else:
            batch = batch.astype(np.float32, copy=False)
            cr = batch[0]
            ci = batch[1]
            iters = batch[2].astype(np.int32)
        self.fetch_seconds += time.perf_counter() - t0
        return cr, ci, iters

    def _replay(self, fetched: cf.Future) -> None:
        decoded = fetched.result()
        if decoded is None:
            return
        if self.mh_bins is not None:
            reps, vks, bins = decoded
            t1 = time.perf_counter()
            hits, points = mh_deposit_numpy(self.hist, bins, vks, reps)
            self.hits += hits
            self.points += points
            self.replay_seconds += time.perf_counter() - t1
            return
        cr, ci, iters = decoded
        t1 = time.perf_counter()
        cv = self.canvas
        if cr.dtype == np.float64:
            replay = native.replay_scatter_f64
            extra = {}
        else:
            replay = native.replay_scatter
            extra = {"strict": self.strict}
        hits, points = replay(
            cr,
            ci,
            iters,
            self.hist,
            width=cv.width,
            height=cv.height,
            min_real=cv.min_real,
            min_imag=cv.min_imag,
            delta_real=cv.delta_real,
            delta_imag=cv.delta_imag,
            burning_ship=self.burning_ship,
            num_threads=self.num_threads,
            **extra,
        )
        self.hits += hits
        self.points += points
        self.replay_seconds += time.perf_counter() - t1

    def add_resumed(self, hist0: np.ndarray) -> None:
        """Fold a resumed checkpoint into the accumulator, guarding the
        uint64-checkpoint-into-uint32-render downcast (silent wraparound
        would corrupt hours of work)."""
        h0 = np.asarray(hist0)
        if (
            self.hist.dtype == np.uint32
            and h0.dtype == np.uint64
            and int(h0.max(initial=0)) > 0xFFFFFFFF
        ):
            raise ValueError(
                "checkpoint holds uint64 counts above the uint32 range; "
                "resume with --hist-dtype uint64"
            )
        self.hist += h0.astype(self.hist.dtype)

    def drain(self) -> None:
        """Block until all queued replays have accumulated."""
        while self._pending:
            self._pending.popleft().result()

    def close(self) -> None:
        self.drain()
        if self._fetch_pool is not None:
            self._fetch_pool.shutdown(wait=True)
        self._pool.shutdown(wait=True)
