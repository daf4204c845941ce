"""A/B the MH flush-window size at the bench mh_zoom configuration.

The auto flush window for MH targets 1/16 expected emissions per lane
(pallas_engine.Tuning) — sized when pending-slot collisions LOST mass
(last-writer-wins, 17.6% measured). The reservoir merge made collisions
mass-exact (identity trades only, PERF_NOTES "Metropolis-Hastings
sampler"), so the tight window now buys nothing but flush overhead:
at the mh_zoom config the auto window is 256 steps and the measured
kernel rate is ~7e8 lane-steps/s vs the uniform df32 kernel's ~1e10 —
the pass is flush-bound, not classify-bound.

This probe measures lane-step rate, deposited mass/s, and the merge
counters across flush-window sizes so the auto target can be re-fit on
evidence. Collisions under a big window show up as mh_merges (identity
variance, not bias); any nonzero mh_lost_weight is a bug.

Usage: python benchmarks/mh_flush_ab.py [seconds_per_leg] [flushes...]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    flushes = [int(f) for f in sys.argv[2:]] or [0, 1024, 4096, 16384]

    import jax

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    cx, cy = -0.743643887037151, 0.131825904205330
    span = 1e-5
    out = []
    for flush in flushes:
        cfg = RenderConfig(
            canvas=Canvas(
                width=1000, height=1000,
                min_real=cx - span / 2, max_real=cx + span / 2,
                min_imag=cy - span / 2, max_imag=cy + span / 2,
            ),
            band=IterationBand(max_escape_iterations=20000,
                               min_escape_iterations=500),
            sample_domain=(cx - 4 * span, cx + 4 * span,
                           cy - 4 * span, cy + 4 * span),
            seconds_to_run=seconds,
            options=EngineOptions(
                precision="extended", sampler="mh",
                steps_per_flush=flush,
            ),
        )
        engine = PallasEngine(cfg)
        state = engine.init_state(None)
        # Warm both MH pass variants (burn-in + steady state).
        p = 0
        for _ in range(cfg.options.mh_burnin_passes + 1):
            state = engine.run_pass(state, p)
            p += 1
        jax.block_until_ready(state)
        if engine._worker is not None:
            engine._worker.drain()
        # Baseline AFTER the warmup drain: the warmup passes deposit mass
        # before t0 (and auto steps_per_pass scales with steps_per_flush,
        # so big-window legs would get proportionally more untimed
        # deposit counted). Subtract this snapshot from end-of-leg
        # values. histogram() flushes/reset the in-flight tenure tails,
        # so the timed window starts from a clean split point.
        base_mass = float(engine.histogram(state).sum())
        base_st = engine.stats(state)

        t0 = time.monotonic()
        p0 = p
        while time.monotonic() - t0 < seconds:
            state = engine.run_pass(state, p)
            p += 1
            # Throttle like driver.run_render (pipeline depth 2): MH
            # device mode has no host-worker backpressure, and an
            # unthrottled loop enqueues minutes-to-hours of async passes.
            if p % 2 == 0:
                jax.block_until_ready(state)
        jax.block_until_ready(state)
        if engine._worker is not None:
            engine._worker.drain()
        wall = time.monotonic() - t0

        # histogram() FIRST: it runs _flush_mh_tails, whose replay adds
        # hits/points/lost_weight to the worker — stats() read afterwards
        # so the mh_lost_weight invariant covers the tail-flush path too.
        hist = engine.histogram(state)
        st = engine.stats(state)
        scale = st.get("weight_scale", 1)

        def delta(key):
            a, b = st.get(key), base_st.get(key)
            return a - b if a is not None and b is not None else a
        tn = engine.tuning
        lane_steps = (p - p0) * tn.steps_per_pass * engine.lanes
        row = {
            "steps_per_flush": tn.steps_per_flush,
            "inner_unroll": tn.inner_unroll,
            "steps_per_pass": tn.steps_per_pass,
            "passes": p - p0,
            "wall_s": round(wall, 2),
            "lane_steps_per_s": round(lane_steps / wall, 1),
            "deposited_mass_per_s": round(
                (float(hist.sum()) - base_mass) / scale / wall, 1
            ),
            "mh_accepts": delta("mh_accepts"),
            "mh_merges": delta("mh_merges"),
            "mh_merged_rep": delta("mh_merged_rep"),
            "mh_lost_weight": delta("mh_lost_weight"),
            "replay_dropped": st["replay_dropped"] - base_st["replay_dropped"],
        }
        out.append(row)
        print(json.dumps(row), flush=True)
        if engine._worker is not None:
            engine._worker.close()
        del state, engine
        import gc

        gc.collect()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
