"""A/B the device replay's scatter backends against host replay at the
headline band (1000x1000, c=2000/m=20000) on the attached chip.

Motivation (r4, VERDICT #2): the on-chip accumulation kernel
(ops/binning.scatter_pallas) measured 380 M ids/s standalone vs XLA's
132 M; this probe measures what that buys END-TO-END — the number the
hybrid share solver (Tuning.auto_device_share) needs is the effective
device replay rate (pts/s including chunk-tail sentinels, dispatch and
the classify stream sharing the chip).

Run: python benchmarks/device_replay_ab.py [seconds_per_leg] [legs...]
  legs: device-pallas device-xla host (default all three); a leg may
        carry @share and @xN suffixes: host@0.3@x4 = replay host,
        forced device share 0.3, 4x auto steps-per-pass (+ capacity).
  --band mi:ma switches from the headline band (default 2000:20000).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    args = list(sys.argv[1:])
    band_arg = (2000, 20000)
    if "--band" in args:
        i = args.index("--band")
        mi, _, ma = args[i + 1].partition(":")
        band_arg = (int(mi), int(ma))
        del args[i:i + 2]
    seconds = float(args[0]) if args else 10.0
    legs = args[1:] or ["device-pallas", "device-xla", "host"]

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
        parts = leg.split("@")
        spec = parts[0]
        share = -1.0
        mult = 1
        for p_ in parts[1:]:
            if p_.startswith("x"):
                mult = int(p_[1:])
            else:
                share = float(p_)
        replay, _, scatter = spec.partition("-")
        opts = dict(replay=replay, scatter=scatter or "auto",
                    replay_device_share=share)
        if mult > 1:
            # Longer passes amortize the per-pass fixed overhead
            # (dispatch + compaction); scale capacity alongside so the
            # emission model keeps drops at zero.
            base = RenderConfig(
                canvas=Canvas(width=1000, height=1000),
                band=IterationBand(max_escape_iterations=band_arg[1],
                                   min_escape_iterations=band_arg[0]),
            )
            from cudabrot_tpu.engines.pallas_engine import Tuning

            tn = Tuning(base)
            opts["steps_per_pass"] = tn.steps_per_pass * mult
            opts["replay_capacity"] = tn.replay_capacity * mult
        cfg = RenderConfig(
            canvas=Canvas(width=1000, height=1000),
            band=IterationBand(max_escape_iterations=band_arg[1],
                               min_escape_iterations=band_arg[0]),
            seconds_to_run=seconds,
            options=EngineOptions(**opts),
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
