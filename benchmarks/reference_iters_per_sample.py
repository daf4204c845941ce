"""Measure E[iterations/sample] under REFERENCE semantics (default band).

bench.py's `vs_reference_hw` converts the reference's only published
default-band measurement — 818 passes x 13,107,200 samples / 10.009 s
= 1.071e9 samples/s on a Radeon VII (version_timing.txt:74-84) — into
complex iterations/s via E[iterations/sample]. The original constant
assumed E ~= 4.4; this script MEASURES it with the reference's exact
semantics (f64 numpy, 4e7 samples — MC error < 0.1%):

  - c uniform over [-2,2]^2 (cudabrot.cu:392-393)
  - cardioid + period-2-bulb cull -> 0 iterations (cudabrot.cu:284-298)
  - z starts at c (cudabrot.cu:323-324), escape at |z|^2 > 4, cap 100;
    every executed iteration counts (the reference runs interior
    samples to the cap — it has no cycle detection)
  - in-band samples ([20,100)) are re-iterated by DrawPath for their
    full escape length (cudabrot.cu:347-365): + E[t | in-band] * P

Result (2026-08-20, N=4e7, seed 42):
  E[classify]   = 3.2267
  P(in-band)    = 0.011516
  E[replay]     = 0.4435
  E[total]      = 3.6702
  => reference default ~= 1.071e9 * 3.670 = 3.93e9 iters/s.

bench.py's REFERENCE_DEFAULT_ITERS_PER_SEC carries this number; rerun
this script if the conversion is ever questioned.
"""

from __future__ import annotations

import numpy as np


def measure(n: int = 40_000_000, batch: int = 4_000_000, seed: int = 42):
    rng = np.random.default_rng(seed)
    tot_classify = 0.0
    tot_replay = 0.0
    tot_inband = 0
    for _ in range(n // batch):
        cr = rng.uniform(-2, 2, batch)
        ci = rng.uniform(-2, 2, batch)
        q = (cr - 0.25) ** 2 + ci * ci
        cull = (q * (q + (cr - 0.25)) <= 0.25 * ci * ci) | (
            (cr + 1.0) ** 2 + ci * ci <= 0.0625
        )
        zr = cr.copy()
        zi = ci.copy()
        alive = ~cull
        esc_t = np.zeros(batch, np.int32)
        iters = np.zeros(batch, np.int64)
        for t in range(1, 101):
            if not alive.any():
                break
            zr2 = zr[alive]
            zi2 = zi[alive]
            nzr = zr2 * zr2 - zi2 * zi2 + cr[alive]
            nzi = 2 * zr2 * zi2 + ci[alive]
            zr[alive] = nzr
            zi[alive] = nzi
            iters[alive] += 1
            esc = nzr * nzr + nzi * nzi > 4.0
            idx = np.flatnonzero(alive)
            esc_t[idx[esc]] = t
            alive[idx[esc]] = False
        tot_classify += iters.sum()
        inband = (esc_t >= 20) & (esc_t < 100)
        tot_inband += inband.sum()
        tot_replay += esc_t[inband].sum()
    return {
        "samples": n,
        "e_classify": tot_classify / n,
        "p_in_band": tot_inband / n,
        "e_replay": tot_replay / n,
        "e_total": tot_classify / n + tot_replay / n,
    }


if __name__ == "__main__":
    r = measure()
    for k, v in r.items():
        print(f"{k} = {v}")
    print("reference default it/s =", 1.071e9 * r["e_total"])
