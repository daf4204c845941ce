"""Deep-tail PRNG bias probe: in-band rate per refill-RNG mode.

The [45000, 60000) band's in-band rate is a sensitive functional of the
sampler's deep escape-time tail — exactly the statistic the hardware
PRNG's long-stream correlations distorted (-19%/+12% by stream length,
PERF_NOTES.md "PRNG stream separation"). This probe runs the identical
classify kernel with each refill mode and reports the in-band rate per
draw with its Poisson error, plus the raw lane-step rate, so a candidate
mode (e.g. "hardware_rw", per-window reseed) can be accepted or rejected
against the threefry ground truth on numbers.

Usage: python benchmarks/prng_bias_probe.py [--modes threefry,hardware_rw]
           [--passes 24] [--min 45000] [--max 60000] [--unroll 16]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="threefry,hardware,hardware_rw")
    ap.add_argument("--passes", type=int, default=24)
    ap.add_argument("--min", type=int, default=45000)
    ap.add_argument("--max", type=int, default=60000)
    ap.add_argument("--unroll", type=int, default=16)
    ap.add_argument("--lane-rows", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1 << 19)
    ap.add_argument("--flush", type=int, default=1 << 14)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    from cudabrot_tpu.models import fractals
    from cudabrot_tpu.ops import pallas_kernels as pk

    fractal = fractals.get_fractal("buddhabrot")
    lanes = args.lane_rows * 128
    interpret = jax.default_backend() != "tpu"
    out = {
        "band": [args.min, args.max],
        "passes": args.passes,
        "lane_steps_per_pass": args.steps * lanes,
        "modes": {},
    }

    for mode in args.modes.split(","):
        mode = mode.strip()

        @functools.partial(jax.jit, donate_argnums=0)
        def step_fn(state, pass_index, _mode=mode):
            seed = jax.random.bits(
                jax.random.fold_in(jax.random.key(1337), pass_index),
                (), jnp.uint32,
            )
            r = pk.classify_pass(
                pk.LaneState(*state), seed, None,
                fractal=fractal,
                min_it=args.min, max_it=args.max,
                steps_per_pass=args.steps,
                steps_per_flush=args.flush,
                cycle_detection=True, interpret=interpret,
                inner_unroll=args.unroll, thin_tracking=True,
                rng=_mode,
            )
            # Per-lane counters are int32; float64 sums are exact here
            # (values << 2^53) and sidestep the no-x64-int config.
            stats = jnp.sum(
                r.stats.reshape(pk.STATS_ROWS, -1).astype(jnp.float64),
                axis=1,
            )
            return tuple(r.state), stats

        state = tuple(pk.init_lane_state(args.lane_rows))
        # Warmup + steady-state lanes.
        state, acc = step_fn(state, 0)
        jax.block_until_ready(acc)
        drawn = in_band = 0.0
        t0 = time.perf_counter()
        for p in range(1, args.passes + 1):
            state, acc = step_fn(state, p)
            a = jax.device_get(acc)
            drawn += float(a[pk.STAT_DRAWN])
            in_band += float(a[pk.STAT_IN_BAND])
        wall = time.perf_counter() - t0
        rate = in_band / drawn if drawn else 0.0
        err = (in_band ** 0.5) / drawn if in_band else float("inf")
        out["modes"][mode] = {
            "drawn": drawn,
            "in_band": in_band,
            "in_band_rate": rate,
            "poisson_rel_err": err / rate if rate else None,
            "raw_lane_steps_per_sec": args.passes * args.steps * lanes / wall,
        }
        print(
            f"{mode}: rate={rate:.4e} +- {100 * (err / rate if rate else 0):.1f}%"
            f"  raw={out['modes'][mode]['raw_lane_steps_per_sec']:.3e} steps/s"
        )

    modes = out["modes"]
    if "threefry" in modes:
        ref = modes["threefry"]["in_band_rate"]
        for m, v in modes.items():
            v["vs_threefry"] = v["in_band_rate"] / ref - 1.0 if ref else None
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
