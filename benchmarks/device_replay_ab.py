"""A/B the device replay's scatter backends against host replay at the
headline band (1000x1000, c=2000/m=20000) on the attached chip.

Motivation (r4, VERDICT #2): the on-chip accumulation kernel
(ops/binning.scatter_pallas) measured 380 M ids/s standalone vs XLA's
132 M; this probe measures what that buys END-TO-END — the number the
hybrid share solver (Tuning.auto_device_share) needs is the effective
device replay rate (pts/s including chunk-tail sentinels, dispatch and
the classify stream sharing the chip).

Run: python benchmarks/device_replay_ab.py [seconds_per_leg] [legs...]
  legs: device-pallas device-xla host (default all three)
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    legs = sys.argv[2:] or ["device-pallas", "device-xla", "host"]

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

    for leg in legs:
        spec, _, share = leg.partition("@")
        replay, _, scatter = spec.partition("-")
        cfg = RenderConfig(
            canvas=Canvas(width=1000, height=1000),
            band=IterationBand(max_escape_iterations=20000,
                               min_escape_iterations=2000),
            seconds_to_run=seconds,
            options=EngineOptions(
                replay=replay, scatter=scatter or "auto",
                replay_device_share=float(share) if share else -1.0,
            ),
        )
        engine = PallasEngine(cfg)
        state = engine.init_state(None)
        engine.warmup(state)
        state = engine.init_state(None)

        t0 = time.monotonic()
        p = 0
        while time.monotonic() - t0 < seconds:
            state = engine.run_pass(state, p)
            p += 1
            if p % 2 == 0:
                jax.block_until_ready(state)
        jax.block_until_ready(state)
        if engine._worker is not None:
            engine._worker.drain()
        wall = time.monotonic() - t0
        st = engine.stats(state)
        useful = st["classify_iters"] + st["orbit_points"]
        print(json.dumps({
            "leg": leg,
            "passes": p,
            "wall_s": round(wall, 2),
            "it_per_s": round(useful / wall, 1),
            "classify_it_per_s": round(st["classify_iters"] / wall, 1),
            "points_per_s": round(st["orbit_points"] / wall, 1),
            "replay_dropped": st["replay_dropped"],
            "hist_mass": int(engine.histogram(state).sum()),
        }), flush=True)
        if engine._worker is not None:
            engine._worker.close()
        del state, engine
        import gc

        gc.collect()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
