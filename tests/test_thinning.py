"""The pending-slot overwrite is an unbiased thinning — measured, not
argued.

The uniform kernel queues each in-band finish in a one-deep per-lane
pending register flushed every `steps_per_flush` steps; a second finish
in one window overwrites the first (ops/pallas_kernels.py docstring).
The docstring argues the drop is value-independent; MH's reservoir-merge
history (a measured 14.5% bias from similar slot pressure) is why this
is tested rather than trusted. The emitted (c, it) stream is the
complete statistic (replay is a deterministic function of it), so we
compare the emitted escape-iteration distribution under ~97% forced
drops against structurally drop-free ground truth
(steps_per_flush <= min_it makes two in-band finishes per window
impossible: an in-band sample needs >= min_it steps).

Seeds are fixed and the kernel is deterministic per (seed, pass), so the
asserted statistics are exact reproducible values, not flaky draws.
Calibration: benchmarks/thinning_bias_probe.py (6-pass run: null
chi2/dof 0.999, stress-vs-truth 1.088 at drop rate 0.9766).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cudabrot_tpu.models import fractals
from cudabrot_tpu.ops import pallas_kernels as pk

MIN_IT, MAX_IT = 5, 60
LANE_ROWS = 8
STEPS_PER_PASS = 8192


def _run(seed0: int, passes: int, steps_per_flush: int):
    interpret = jax.default_backend() != "tpu"
    state = pk.init_lane_state(LANE_ROWS)
    emitted = []
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
        emitted.append(it[it >= 0])
        in_band += int(np.asarray(res.stats)[pk.STAT_IN_BAND].sum())
    return np.concatenate(emitted), in_band


def _chi2_per_dof(a: np.ndarray, b: np.ndarray) -> float:
    """Two-sample chi-square per dof over the escape-iteration support."""
    bins = np.arange(MIN_IT, MAX_IT + 1)
    ha, _ = np.histogram(a, bins=bins)
    hb, _ = np.histogram(b, bins=bins)
    keep = (ha + hb) >= 10
    ha, hb = ha[keep].astype(float), hb[keep].astype(float)
    na, nb = ha.sum(), hb.sum()
    t = (np.sqrt(nb / na) * ha - np.sqrt(na / nb) * hb) ** 2 / (ha + hb)
    return float(t.sum() / max(len(ha) - 1, 1))


def test_overwrite_thinning_is_unbiased():
    # Ground truth: zero drops by construction.
    truth, band_t = _run(101, 3, steps_per_flush=4)
    assert len(truth) == band_t  # the structural zero-drop guarantee
    # Stress: 2048-step windows on a hot band force overwrites on almost
    # every emission opportunity.
    stress, band_s = _run(555, 6, steps_per_flush=2048)
    drop_rate = 1.0 - len(stress) / band_s
    assert drop_rate > 0.9  # the stress must actually stress
    assert len(stress) > 20_000  # enough power for the chi-square

    # Escape-time distribution: chi2/dof ~ 1 under the no-bias null
    # (sigma = sqrt(2/dof) ~ 0.2 at ~50 dof; 1.6 is a ~3-sigma gate, and
    # the measured length-biased CAPACITY drop mode scores >> this).
    assert _chi2_per_dof(stress, truth) < 1.6

    # First moment: a length-biased thinning must shift the mean emitted
    # orbit length; bound the shift by ~5 combined standard errors.
    se = float(
        np.hypot(
            truth.std() / np.sqrt(len(truth)),
            stress.std() / np.sqrt(len(stress)),
        )
    )
    assert abs(float(truth.mean()) - float(stress.mean())) < 5 * se
