"""Statistically bound the bias of the pending-slot overwrite thinning.

The uniform sampler queues each in-band finish in a one-deep per-lane
pending register and flushes it every `steps_per_flush` lane steps; a
second in-band finish inside one window overwrites (drops) the first
(ops/pallas_kernels.py module docstring). The docstring claims the drop
is an *unbiased* thinning of the in-band stream. MH's reservoir-merge
history (a measured 14.5% bias from the same kind of slot pressure,
PERF_NOTES) says: measure, don't argue.

Method: the escape-time distribution of EMITTED samples is the complete
statistic here (the replayed orbit is a deterministic function of c, and
what the histogram receives is exactly the emitted (c, it) stream).
  * Ground truth: steps_per_flush <= min_it structurally forbids two
    in-band finishes in one window -> zero overwrite drops.
  * Stressed: a long flush window on a hot full-domain band drives the
    overwrite rate to tens of percent.
Compare the emitted escape-iteration histograms (chi-square per degree
of freedom), calibrated against the null distance between two
independent-seed ground-truth runs, and compare mean emitted orbit
length (the moment a length-biased thinning must shift).

Usage: python benchmarks/thinning_bias_probe.py [passes]
"""

from __future__ import annotations

import json
import sys

import numpy as np


MIN_IT, MAX_IT = 5, 60
LANE_ROWS = 8
STEPS_PER_PASS = 8192


def run(seed0: int, passes: int, steps_per_flush: int):
    import jax
    import jax.numpy as jnp

    from cudabrot_tpu.models import fractals
    from cudabrot_tpu.ops import pallas_kernels as pk

    interpret = jax.default_backend() != "tpu"
    state = pk.init_lane_state(LANE_ROWS)
    emitted_it = []
    in_band = 0
    for p in range(passes):
        res = pk.classify_pass(
            state,
            jnp.uint32(seed0 + p),
            fractal=fractals.get_fractal("buddhabrot"),
            min_it=MIN_IT,
            max_it=MAX_IT,
            steps_per_pass=STEPS_PER_PASS,
            steps_per_flush=steps_per_flush,
            interpret=interpret,
            inner_unroll=1,
        )
        state = res.state
        it = np.asarray(res.emit_it).ravel()
        emitted_it.append(it[it >= 0])
        in_band += int(np.asarray(res.stats)[pk.STAT_IN_BAND].sum())
    it = np.concatenate(emitted_it)
    return it, in_band


def chi2_per_dof(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample chi-square statistic per degree of freedom over the
    escape-iteration support (bins pooled below an expected count of 5)."""
    bins = np.arange(MIN_IT, MAX_IT + 1)
    ha, _ = np.histogram(a, bins=bins)
    hb, _ = np.histogram(b, bins=bins)
    keep = (ha + hb) >= 10
    ha, hb = ha[keep].astype(float), hb[keep].astype(float)
    na, nb = ha.sum(), hb.sum()
    # Standard two-sample chi-square with unequal totals.
    t = (np.sqrt(nb / na) * ha - np.sqrt(na / nb) * hb) ** 2 / (ha + hb)
    return float(t.sum() / max(len(ha) - 1, 1))


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    # Ground truth: window <= min_it -> structurally zero drops.
    t1, band1 = run(101, passes, steps_per_flush=4)
    t2, band2 = run(909, passes, steps_per_flush=4)
    # Stressed: long window, same band.
    sflush = 2048
    s1, bands = run(555, 2 * passes, steps_per_flush=sflush)

    drop_truth = 1.0 - len(t1) / band1
    drop_stress = 1.0 - len(s1) / bands
    out = {
        "passes": passes,
        "truth_emitted": len(t1),
        "stress_emitted": len(s1),
        "truth_drop_rate": round(drop_truth, 4),
        "stress_drop_rate": round(drop_stress, 4),
        "mean_it_truth": round(float(t1.mean()), 4),
        "mean_it_truth2": round(float(t2.mean()), 4),
        "mean_it_stress": round(float(s1.mean()), 4),
        "se_mean_truth": round(float(t1.std() / np.sqrt(len(t1))), 4),
        "se_mean_stress": round(float(s1.std() / np.sqrt(len(s1))), 4),
        "chi2dof_null": round(chi2_per_dof(t1, t2), 3),
        "chi2dof_stress_vs_truth": round(chi2_per_dof(s1, t1), 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
