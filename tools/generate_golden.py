"""Generate the golden-render regression fixtures (tests/golden/*.npz).

Each fixture is a small deterministic oracle render (fixed passes, fixed
seed, CPU) of a configuration that exercises a distinct semantic axis:
band filtering, gamma, canvas cropping, and the burning-ship variant.
The test suite (tests/test_golden.py) re-renders and compares
statistically — golden fixtures pin the *distribution*, catching
semantic regressions (wrong band boundaries, broken culls, histogram
misbinning) that unit tests can miss.

Regenerate only when an intentional semantic change occurs:
    python tools/generate_golden.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
)

CASES = {
    "default_band": dict(width=64, height=64, max_it=100, min_it=20),
    "high_band": dict(width=64, height=64, max_it=1000, min_it=100),
    "cropped": dict(width=48, height=48, max_it=200, min_it=10,
                    min_real=-1.0, max_real=0.5, min_imag=-0.75,
                    max_imag=0.75),
    "burning_ship": dict(width=64, height=64, max_it=100, min_it=20,
                         fractal="burning-ship"),
    # Metropolis-Hastings crop (pallas engine — MH has no oracle): pins
    # the chain mechanics + weighted deposit pipeline end-to-end.
    # Geometry is explicit so the tuning (and therefore the Threefry
    # window schedule) cannot drift the stream.
    "mh_crop": dict(width=40, height=40, max_it=300, min_it=20,
                    min_real=-0.78, max_real=-0.72,
                    min_imag=0.05, max_imag=0.11,
                    sampler="mh", lane_rows=8, steps_per_pass=8192,
                    steps_per_flush=128, inner_unroll=4),
}
PASSES = 4


def render(case: dict) -> np.ndarray:
    import jax

    from cudabrot_tpu.config import (
        Canvas, EngineOptions, IterationBand, RenderConfig,
    )
    from cudabrot_tpu.engines.oracle_engine import OracleEngine

    canvas_keys = (
        "width", "height", "min_real", "max_real", "min_imag", "max_imag"
    )
    mh = case.get("sampler") == "mh"
    if mh:
        opts = EngineOptions(
            engine="pallas",
            sampler="mh",
            lane_rows=case["lane_rows"],
            steps_per_pass=case["steps_per_pass"],
            steps_per_flush=case["steps_per_flush"],
            inner_unroll=case["inner_unroll"],
            mh_burnin_passes=1,
        )
    else:
        opts = EngineOptions(engine="oracle",
                             oracle_samples_per_pass=1 << 15)
    cfg = RenderConfig(
        canvas=Canvas(**{k: v for k, v in case.items() if k in canvas_keys}),
        band=IterationBand(max_escape_iterations=case["max_it"],
                           min_escape_iterations=case["min_it"]),
        fractal=case.get("fractal", "buddhabrot"),
        seconds_to_run=-1.0,
        options=opts,
    )
    if mh:
        from cudabrot_tpu.engines.pallas_engine import PallasEngine

        eng = PallasEngine(cfg)
    else:
        eng = OracleEngine(cfg)
    state = eng.init_state(None)
    for p in range(PASSES):
        state = eng.run_pass(state, p)
    jax.block_until_ready(state)
    return eng.histogram(state)


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, case in CASES.items():
        hist = render(case)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, hist=hist,
                            meta=np.frombuffer(
                                repr(sorted(case.items())).encode(),
                                dtype=np.uint8))
        print(f"{name}: mass={int(hist.sum())}, max={int(hist.max())} "
              f"-> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
