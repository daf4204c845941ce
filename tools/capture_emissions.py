"""Capture real in-band emission batches from the TPU engine as a fixture.

The native-replay microbenchmark (benchmarks/replay_microbench.py) needs
realistic orbits: synthetic (c, iters) pairs would mostly escape to inf
early and skip the histogram increments, overstating throughput. This
captures the exact decoded batches the host worker would replay at the
headline band and stores them for offline (TPU-free) iteration on csrc/.

Usage: python tools/capture_emissions.py [passes] [out.npz]
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "benchmarks/fixtures/headline_emissions.npz"
    )
    cfg = RenderConfig(
        canvas=Canvas(width=1000, height=1000),
        band=IterationBand(max_escape_iterations=20000,
                           min_escape_iterations=2000),
    )
    engine = PallasEngine(cfg, replay_mode="host")
    state = engine.init_state(None)

    crs, cis, its = [], [], []
    for p in range(passes):
        state, n_valid, payload = engine._pass_fn(state, p)
        n = int(np.asarray(n_valid))
        batch = np.asarray(payload)
        # Decode the packed layout exactly as HostReplayWorker._job does.
        w0, w1 = batch[0], batch[1]
        k_r = (w0 & 0xFFFFFF).astype(np.float32)
        k_i = (w1 & 0xFFFFFF).astype(np.float32)
        cr = k_r * np.float32(2.384185791015625e-07) - np.float32(2.0)
        ci = k_i * np.float32(2.384185791015625e-07) - np.float32(2.0)
        enc = (w0 >> 24) | ((w1 >> 24) << 8)
        iters = enc.astype(np.int32) - 1
        live = iters >= 0
        print(f"pass {p}: n_valid={n} decoded_live={int(live.sum())}")
        crs.append(cr)
        cis.append(ci)
        its.append(iters)

    cr = np.concatenate(crs)
    ci = np.concatenate(cis)
    iters = np.concatenate(its)
    np.savez_compressed(out, cr=cr, ci=ci, iters=iters,
                        width=1000, height=1000,
                        min_real=cfg.canvas.min_real,
                        min_imag=cfg.canvas.min_imag,
                        delta_real=cfg.canvas.delta_real,
                        delta_imag=cfg.canvas.delta_imag)
    live = iters >= 0
    pts = int((iters[live] + 1).sum())
    print(f"saved {out}: {iters.size} slots, {int(live.sum())} live, "
          f"{pts} orbit points")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
