"""Row-sharded histogram at a canvas that motivates it (20000x20000).

The sharding test suite proves bitwise equality sharded-vs-replicated at
toy canvases; this probe executes the same property at the north-star
canvas — 20000x20000 = 1.6 GB of uint32 histogram, 2500 rows per shard
on an 8-device mesh — where per-device memory (200 MB/shard vs 1.6 GB
replica) is the actual motivation (reference memory guidance:
/root/reference/README.md:74-76). Runs on the virtual CPU mesh (the
sandbox exposes one real chip; the engine code is identical on real
ICI) with a shallow band so interpret-mode classify still produces real
emission mass in a few passes.

Prints one JSON line with total mass, per-shard row occupancy, and the
bitwise-equality verdict vs the replicated engine.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python benchmarks/sharded_at_scale.py [--passes 2] [--skip-replicated]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--width", type=int, default=20000)
    ap.add_argument("--height", type=int, default=20000)
    ap.add_argument("--skip-replicated", action="store_true",
                    help="run only the sharded engine (halves memory)")
    args = ap.parse_args(argv)

    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from cudabrot_tpu import engines
    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )

    def cfg_for(sharding: str) -> RenderConfig:
        return RenderConfig(
            canvas=Canvas(width=args.width, height=args.height),
            # Shallow band: high emission rate, so interpret-mode classify
            # yields real scatter mass in a couple of small passes.
            band=IterationBand(max_escape_iterations=500,
                               min_escape_iterations=20),
            options=EngineOptions(
                engine="pallas",
                histogram_sharding=sharding,
                replay="device",
                lane_rows=8,
                steps_per_pass=2048,
                steps_per_flush=256,
                replay_capacity=1 << 13,
                num_devices=8,
            ),
        )

    def run(sharding: str):
        eng = engines.make_engine(cfg_for(sharding))
        state = eng.init_state(None)
        t0 = time.time()
        for p in range(args.passes):
            state = eng.run_pass(state, p)
        jax.block_until_ready(state)
        wall = time.time() - t0
        hist = eng.histogram(state)
        stats = eng.stats(state)
        return eng, hist, stats, wall

    out: dict = {
        "canvas": [args.width, args.height],
        "hist_bytes": args.width * args.height * 4,
        "devices": 8,
        "passes": args.passes,
    }

    eng_s, hist_s, stats_s, wall_s = run("rows")
    out["engine"] = eng_s.name
    out["rows_per_shard"] = eng_s.rows_per_shard
    out["shard_bytes"] = eng_s.rows_per_shard * args.width * 4
    out["sharded_wall_seconds"] = round(wall_s, 2)
    out["mass"] = int(hist_s.sum())
    out["max_count"] = int(hist_s.max())
    out["on_canvas_points"] = stats_s.get("on_canvas_points",
                                          stats_s.get("orbit_points"))
    # Every shard's row range must have received real mass — the property
    # a toy canvas cannot demonstrate (68 rows split 8 ways leaves shards
    # that plausibly stay empty by accident).
    rps = eng_s.rows_per_shard
    shard_mass = [
        int(hist_s[d * rps : (d + 1) * rps].sum()) for d in range(8)
    ]
    out["shard_mass"] = shard_mass
    out["all_shards_populated"] = all(m > 0 for m in shard_mass)

    if not args.skip_replicated:
        _, hist_r, _, wall_r = run("replicated")
        out["replicated_wall_seconds"] = round(wall_r, 2)
        out["bitwise_equal_to_replicated"] = bool(
            np.array_equal(hist_s, hist_r)
        )

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
