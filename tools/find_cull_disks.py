"""Find conservative interior cull disks beyond the reference's two tests.

The reference culls only the main cardioid and the period-2 bulb
(cudabrot.cu:284-298) — the two components with exact closed forms. The
remaining M-interior (~0.13 of the sample domain's area) is what the
classify kernel burns Brent-detection latency on. Low-period hyperbolic
components (the period-3 "rabbit" pair and airplane, the period-4 top
bulbs and real-axis component) are not exact circles, but a disk
strictly inscribed in one is a sound cull: every point in a hyperbolic
component is interior to the Mandelbrot set, hence never escapes
(cudabrot.cu:397-399 semantics).

Method, per component nucleus c0 (a root of Q^p_c(0) = 0):
  1. For a ray direction theta, binary-search the largest t such that
     c = c0 + t*e^{i theta} still has an attracting period-p cycle:
     iterate z <- Q_c(z) from the critical point for a transient, then
     test |(Q^p_c)'(cycle)| < MARGIN < 1 (float64 throughout).
  2. The disk radius is min over a dense theta grid, times a further
     safety factor — so the disk sits strictly inside the component
     with double margin.

Multiplier < 1 is the definition of the attracting cycle's basin
(hyperbolic component membership), so unlike escape-time probing there
is no "hasn't escaped YET" ambiguity. Prints python constants for
models/fractals.py and verifies each disk by brute-force long-orbit
non-escape sampling.

Usage: python tools/find_cull_disks.py [--samples 720] [--margin 0.97]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: (name, period, nucleus) — nuclei are roots of the period-p polynomial
#: (standard values, recomputed below via Newton for full f64 precision).
CANDIDATES = [
    ("rabbit_top", 3, -0.122561 + 0.744862j),
    ("rabbit_bottom", 3, -0.122561 - 0.744862j),
    ("airplane", 3, -1.754878 + 0.0j),
    ("top_bulb_4_a", 4, 0.282271 + 0.530061j),
    ("top_bulb_4_b", 4, 0.282271 - 0.530061j),
    ("real_4", 4, -1.310702 + 0.0j),
]


def refine_nucleus(c0: complex, period: int, iters: int = 60) -> complex:
    """Newton on f(c) = Q^p_c(0) (nucleus: critical orbit is periodic)."""
    c = c0
    for _ in range(iters):
        z = 0.0 + 0.0j
        dz = 0.0 + 0.0j  # d/dc Q^n_c(0)
        for _ in range(period):
            dz = 2.0 * z * dz + 1.0
            z = z * z + c
        if dz == 0:
            break
        step = z / dz
        c = c - step
        if abs(step) < 1e-15:
            break
    return c


def multiplier(c: complex, period: int, transient: int = 100000,
               tol: float = 1e-13):
    """|(Q^p_c)'| at the attracting cycle reached from the critical
    point, or None if the orbit escapes / does not settle."""
    z = 0.0 + 0.0j
    for _ in range(transient):
        z = z * z + c
        if (z.real * z.real + z.imag * z.imag) > 4.0:
            return None
    # z is (numerically) on the cycle; accumulate the cycle derivative.
    m = 1.0 + 0.0j
    w = z
    for _ in range(period):
        m = m * (2.0 * w)
        w = w * w + c
    if abs(w - z) > tol * max(1.0, abs(z)):
        return None  # not settled to a period-p cycle
    return abs(m)


def inscribed_radius(c0: complex, period: int, samples: int,
                     margin: float) -> float:
    """Largest disk radius around c0 with |multiplier| < margin on every
    sampled ray."""
    r_min = np.inf
    for theta in np.linspace(0.0, 2.0 * np.pi, samples, endpoint=False):
        d = complex(np.cos(theta), np.sin(theta))
        lo, hi = 0.0, 0.30
        # Grow hi down first: find a bracketing failure.
        while hi - lo > 1e-6:
            mid = 0.5 * (lo + hi)
            m = multiplier(c0 + mid * d, period)
            if m is not None and m < margin:
                lo = mid
            else:
                hi = mid
        r_min = min(r_min, lo)
    return float(r_min)


def verify_disk(c0: complex, r: float, trials: int, max_it: int,
                seed: int = 0) -> bool:
    """Brute-force check: random points in the disk never escape within
    max_it (necessary-condition sanity net under the multiplier proof)."""
    rng = np.random.default_rng(seed)
    t = np.sqrt(rng.uniform(0, 1, trials)) * r
    a = rng.uniform(0, 2 * np.pi, trials)
    cs = c0 + t * np.exp(1j * a)
    z = np.zeros_like(cs)
    alive = np.ones(len(cs), bool)
    for _ in range(max_it):
        z[alive] = z[alive] * z[alive] + cs[alive]
        alive &= (z.real * z.real + z.imag * z.imag) <= 4.0
        if not alive.any():
            return False
    return bool(alive.all())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=720)
    ap.add_argument("--margin", type=float, default=0.97)
    ap.add_argument("--safety", type=float, default=0.995)
    ap.add_argument("--verify-trials", type=int, default=20000)
    ap.add_argument("--verify-iters", type=int, default=200000)
    args = ap.parse_args(argv)

    total_area = 0.0
    rows = []
    for name, period, c0 in CANDIDATES:
        c = refine_nucleus(c0, period)
        r = inscribed_radius(c, period, args.samples, args.margin)
        r *= args.safety
        ok = verify_disk(c, r, args.verify_trials, args.verify_iters)
        area = np.pi * r * r
        total_area += area
        rows.append((name, period, c, r, area, ok))
        print(f"{name}: period={period} center={c.real:+.9f}"
              f"{c.imag:+.9f}j r={r:.6f} area={area:.5f} "
              f"verified={'OK' if ok else 'FAIL'}")
    print(f"total extra culled area: {total_area:.5f} "
          f"({100 * total_area / 16.0:.3f}% of the sample domain; "
          f"M-area ~1.5066, cardioid+p2 ~1.3744)")
    print("\n# constants for models/fractals.py:")
    print("EXTRA_CULL_DISKS = (")
    for name, period, c, r, _, ok in rows:
        if ok:
            print(f"    ({c.real:+.9f}, {c.imag:+.9f}, "
                  f"{r * r:.12f}),  # {name} (p{period}), r={r:.6f}")
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
