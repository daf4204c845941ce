"""A/B the classify kernel's escape-tracking modes across window sizes.

Measures the raw classify lane-step rate (phase A of
benchmarks/phase_breakdown.py — no compaction/replay) for the per-step
("step") vs window-boundary ("thin") escape bookkeeping at several inner
window sizes U. The thin mode collapses the per-step mask chain to a
survival counter and moves Brent checks to window boundaries
(cudabrot_tpu/ops/pallas_kernels.py), shortening the inner instruction
stream; this script records how much of that shows up on silicon.

Methodology per the repo environment rules: pipelined passes, slope
between N and 2N runs, forced scalar materialization.

Usage: python benchmarks/tracking_ab.py [--min 2000] [--max 20000]
           [--unrolls 1,4,8,16] [--passes 8]
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
    ap.add_argument("--unrolls", default="1,4,8,16")
    ap.add_argument("--modes", default="step,thin")
    ap.add_argument("--rng", default="threefry",
                    help="refill rng: threefry (production) or hardware")
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

    results = {
        "band": [args.min, args.max],
        "steps_per_pass": args.steps,
        "steps_per_flush": args.flush,
        "lanes": lanes,
        "lane_steps_per_pass": lane_steps_per_pass,
        "cases": {},
    }

    def make_step(unroll: int, thin: bool):
        @functools.partial(jax.jit, donate_argnums=0)
        def step_fn(state, pass_index):
            seed = jax.random.bits(
                jax.random.fold_in(jax.random.key(1337), pass_index),
                (), jnp.uint32,
            )
            bits = None
            if interpret:
                chunks = args.steps // args.flush
                windows = args.flush // unroll
                bits = jax.random.bits(
                    jax.random.fold_in(jax.random.key(7), pass_index),
                    (chunks, windows, 2, lane_rows, 128), jnp.uint32)
            r = pk.classify_pass(
                pk.LaneState(*state), seed, bits,
                fractal=fractal,
                min_it=args.min, max_it=args.max,
                steps_per_pass=args.steps,
                steps_per_flush=args.flush,
                cycle_detection=True, interpret=interpret,
                inner_unroll=unroll, thin_tracking=thin,
                rng=None if interpret else args.rng,
            )
            # Consume emissions + stats so nothing is DCE'd.
            return tuple(r.state), jnp.sum(r.emit_it) + jnp.sum(r.stats)

        return step_fn

    def run(step_fn, n: int, offset: int) -> float:
        state = tuple(pk.init_lane_state(lane_rows))
        acc = None
        for p in range(2):  # compile + steady-state lanes
            state, acc = step_fn(state, p + offset)
        _ = float(jnp.asarray(acc).sum())
        t0 = time.perf_counter()
        for p in range(n):
            state, acc = step_fn(state, 100 + p + offset)
        _ = float(jnp.asarray(acc).sum())
        return time.perf_counter() - t0

    for mode in args.modes.split(","):
        thin = mode == "thin"
        for u_str in args.unrolls.split(","):
            unroll = int(u_str)
            if args.flush % unroll != 0:
                continue
            step_fn = make_step(unroll, thin)
            n = args.passes
            t1 = run(step_fn, n, 0)
            t2 = run(step_fn, 2 * n, 1000)
            per_pass = (t2 - t1) / n
            rate = lane_steps_per_pass / per_pass
            results["cases"][f"{mode}-U{unroll}"] = {
                "seconds_per_pass": round(per_pass, 4),
                "lane_steps_per_sec": float(f"{rate:.4g}"),
            }
            print(f"{mode:>4} U={unroll:<3} {per_pass*1e3:8.2f} ms/pass "
                  f"{rate:.3e} lane-steps/s", flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
