"""Offline native-replay microbenchmark (no TPU needed).

Replays the captured headline-band emission fixture
(tools/capture_emissions.py) through the native engine and reports orbit
points/s. This is the direct denominator of the headline bench: at the
headline band the pipeline is host-replay-bound, so end-to-end
iterations/s scales ~linearly with this number (PERF_NOTES.md).

Usage: python benchmarks/replay_microbench.py [reps] [fixture.npz]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "benchmarks/fixtures/headline_emissions.npz"
    )
    from cudabrot_tpu.io import native

    fx = np.load(path)
    cr = np.ascontiguousarray(fx["cr"], np.float32)
    ci = np.ascontiguousarray(fx["ci"], np.float32)
    iters = np.ascontiguousarray(fx["iters"], np.int32)
    live = iters >= 0
    pts = int((iters[live] + 1).sum())
    w, h = int(fx["width"]), int(fx["height"])
    hist = np.zeros((h, w), np.uint32)

    # Warm once (page-faults the histogram, wakes the CPU governor).
    native.replay_scatter(
        cr[:4096], ci[:4096], iters[:4096], hist,
        width=w, height=h,
        min_real=float(fx["min_real"]), min_imag=float(fx["min_imag"]),
        delta_real=float(fx["delta_real"]), delta_imag=float(fx["delta_imag"]),
        burning_ship=False, num_threads=1,
    )

    rates = []
    hits = points = 0
    for r in range(reps):
        t0 = time.perf_counter()
        hits, points = native.replay_scatter(
            cr, ci, iters, hist,
            width=w, height=h,
            min_real=float(fx["min_real"]), min_imag=float(fx["min_imag"]),
            delta_real=float(fx["delta_real"]),
            delta_imag=float(fx["delta_imag"]),
            burning_ship=False, num_threads=1,
        )
        dt = time.perf_counter() - t0
        rates.append(points / dt)
        print(f"rep {r}: {points / dt:.3e} pts/s  ({dt * 1e3:.1f} ms, "
              f"{points} pts, {hits} hits)")
    assert points == pts, (points, pts)
    med = sorted(rates)[len(rates) // 2]
    print(f"median: {med:.3e} pts/s  on-canvas {hits / points:.3f}  "
          f"hist_mass {int(hist.sum())}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
