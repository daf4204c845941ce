"""Marginal cost of each classify-kernel boundary stage on silicon.

The thin-tracking kernel's inner stream costs ~1.7e-12 s/lane-step but
the window boundary costs ~3.9e-11 s (benchmarks/tracking_ab.py) — far
more than its visible VPU op count suggests. This probe strips boundary
stages cumulatively (via pallas_kernels._make_kernel's benchmark-only
``_ablate`` hook) and measures the rate after each cut, attributing the
boundary budget to: emission bookkeeping, stats counters, cull math,
PRNG draws, refill selects, and Brent checks (via cycle_detection).

Stages are removed *cumulatively* so XLA dead-code elimination cannot
blur attribution (each cut removes the only consumer the next cut would
otherwise feed).

Usage: python benchmarks/boundary_ablation.py [--unroll 8] [--passes 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=int, default=2000)
    ap.add_argument("--max", type=int, default=20000)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--lane-rows", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1 << 18)
    ap.add_argument("--flush", type=int, default=1 << 12)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    import jax.numpy as jnp

    from cudabrot_tpu.models import fractals
    from cudabrot_tpu.ops import pallas_kernels as pk

    fractal = fractals.get_fractal("buddhabrot")
    lane_rows = args.lane_rows
    lanes = lane_rows * 128
    interpret = jax.default_backend() != "tpu"
    lane_steps_per_pass = args.steps * lanes

    # Cumulative strip-down order (each entry removes one more stage).
    LADDER = [
        ("full", (), True),
        ("-emit", ("emit",), True),
        ("-stats", ("emit", "stats"), True),
        ("-brent", ("emit", "stats"), False),
        ("-cull", ("emit", "stats", "cull"), False),
        ("-prng", ("emit", "stats", "cull", "prng"), False),
        ("-refill", ("emit", "stats", "cull", "prng", "refill"), False),
    ]

    def make_step(ablate: tuple, detect: bool):
        @functools.partial(jax.jit, donate_argnums=0)
        def step_fn(state, pass_index):
            seed = jax.random.bits(
                jax.random.fold_in(jax.random.key(1337), pass_index),
                (), jnp.uint32,
            )
            bits = None
            if interpret:
                chunks = args.steps // args.flush
                windows = args.flush // args.unroll
                bits = jax.random.bits(
                    jax.random.fold_in(jax.random.key(7), pass_index),
                    (chunks, windows, 2, lane_rows, 128), jnp.uint32)
            r = pk.classify_pass(
                pk.LaneState(*state), seed, bits,
                fractal=fractal,
                min_it=args.min, max_it=args.max,
                steps_per_pass=args.steps,
                steps_per_flush=args.flush,
                cycle_detection=detect, interpret=interpret,
                inner_unroll=args.unroll, thin_tracking=True,
                _ablate=ablate,
            )
            return tuple(r.state), jnp.sum(r.emit_it) + jnp.sum(r.stats)

        return step_fn

    def run(step_fn, n: int, offset: int) -> float:
        state = tuple(pk.init_lane_state(lane_rows))
        acc = None
        for p in range(2):
            state, acc = step_fn(state, p + offset)
        _ = float(jnp.asarray(acc).sum())
        t0 = time.perf_counter()
        for p in range(n):
            state, acc = step_fn(state, 100 + p + offset)
        _ = float(jnp.asarray(acc).sum())
        return time.perf_counter() - t0

    results = {"unroll": args.unroll, "lane_steps_per_pass":
               lane_steps_per_pass, "ladder": {}}
    prev = None
    for name, ablate, detect in LADDER:
        step_fn = make_step(ablate, detect)
        n = args.passes
        t1 = run(step_fn, n, 0)
        t2 = run(step_fn, 2 * n, 1000)
        per_pass = (t2 - t1) / n
        rate = lane_steps_per_pass / per_pass
        marginal = None if prev is None else per_pass - prev
        prev = per_pass
        results["ladder"][name] = {
            "seconds_per_pass": round(per_pass, 5),
            "lane_steps_per_sec": float(f"{rate:.4g}"),
            "marginal_seconds": None if marginal is None
            else round(marginal, 5),
        }
        m = "" if marginal is None else f"  (cut saves {marginal*1e3:+.2f} ms)"
        print(f"{name:>8} {per_pass*1e3:8.2f} ms/pass "
              f"{rate:.3e} lane-steps/s{m}", flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
