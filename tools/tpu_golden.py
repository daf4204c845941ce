"""TPU-recorded golden fixtures for the Pallas engine (ROADMAP item 9).

The pytest goldens (tests/golden/*.npz) pin the *oracle* semantics on
CPU; these pin the production Pallas kernel's output on real TPU
hardware — in-kernel hardware PRNG, f32 VPU arithmetic, Brent detection,
compaction, and both replay backends — against toolchain updates.

    python tools/tpu_golden.py record   # (re)record fixtures on a TPU
    python tools/tpu_golden.py check    # re-render and compare

`check` reports bitwise equality (expected within one toolchain: the
engine is deterministic for a fixed seed/pass sequence) and falls back
to statistical comparison (mass within 3%, correlation > 0.995) so a
legitimate XLA codegen change (e.g. different FMA contraction) is
distinguishable from a semantic regression: DRIFT (bitwise mismatch,
statistics hold) means re-record after review; FAIL means a real bug.

The pytest suite cannot run this (tests/conftest.py pins the CPU
backend); the round driver's bench environment is where it runs.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "tpu",
)

#: Each case exercises a distinct production-kernel axis on TPU.
CASES = {
    # Device replay: the fully on-device deterministic path (multi-chip
    # `core`), U=1.
    "device_replay": dict(width=128, height=128, max_it=300, min_it=30,
                          replay="device"),
    # Host replay + packed payloads + native accumulation.
    "host_replay": dict(width=128, height=128, max_it=300, min_it=30,
                        replay="host"),
    # Inner windowing U>1 (fine-band configuration) + Brent detection.
    "windowed_fine": dict(width=96, height=96, max_it=20000, min_it=2000,
                          replay="host"),
    # Burning-ship fold (no cull, no cycle detection).
    "burning_ship": dict(width=96, height=96, max_it=200, min_it=20,
                         replay="device", fractal="burning-ship"),
    # Interior-emission mode (anti-Buddhabrot): cycle-detected + maxed
    # lanes emit, each replaying exactly max_it points.
    "anti_buddhabrot": dict(width=96, height=96, max_it=150, min_it=0,
                            replay="host", fractal="anti-buddhabrot"),
}
PASSES = 3


def render(case: dict) -> np.ndarray:
    import jax

    from cudabrot_tpu.config import (
        Canvas, EngineOptions, IterationBand, RenderConfig,
    )
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    cfg = RenderConfig(
        canvas=Canvas(width=case["width"], height=case["height"]),
        band=IterationBand(max_escape_iterations=case["max_it"],
                           min_escape_iterations=case["min_it"]),
        fractal=case.get("fractal", "buddhabrot"),
        options=EngineOptions(engine="pallas", lane_rows=16,
                              steps_per_pass=8192),
    )
    eng = PallasEngine(cfg, replay_mode=case["replay"])
    state = eng.init_state(None)
    for p in range(PASSES):
        state = eng.run_pass(state, p)
    jax.block_until_ready(state)
    return eng.histogram(state)


def main() -> int:
    import jax

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()
    if jax.default_backend() != "tpu":
        print(f"ERROR: needs a TPU backend, have {jax.default_backend()}")
        return 2
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    rc = 0
    for name, case in CASES.items():
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        hist = render(case)
        if mode == "record":
            np.savez_compressed(path, hist=hist)
            print(f"{name}: recorded mass={int(hist.sum())} "
                  f"max={int(hist.max())} -> {path}")
            continue
        if not os.path.exists(path):
            print(f"{name}: MISSING fixture {path} (run `record` on TPU)")
            rc = 1
            continue
        with np.load(path) as data:
            want = data["hist"]
        if np.array_equal(hist, want):
            print(f"{name}: OK (bitwise, mass={int(hist.sum())})")
            continue
        got = hist.astype(np.float64)
        ref = want.astype(np.float64)
        mass = got.sum() / max(ref.sum(), 1.0)
        corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        if 0.97 <= mass <= 1.03 and corr > 0.995:
            print(f"{name}: DRIFT (bitwise mismatch; mass x{mass:.4f}, "
                  f"corr {corr:.5f}) — review toolchain change, then "
                  f"re-record")
            rc = max(rc, 1)
        else:
            print(f"{name}: FAIL (mass x{mass:.4f}, corr {corr:.5f})")
            rc = 2
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
