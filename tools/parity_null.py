"""Null-calibrate the reference-parity table (VERDICT r3 #5).

The parity table (tools/reference_parity.py) reports Pearson correlation
between our renders and the reference's published gallery
(/root/reference/examples, recipes in its README.md:132-157). Both sides
are Monte-Carlo estimates, so the achievable correlation is capped by
BOTH images' shot noise: with independent noise,

    corr(A, B) ~= c_A * c_B,   c_X := corr(X, truth).

This tool measures that cap per pair instead of assuming it:

  - our side: render the SAME recipe twice with different seeds at the
    gallery budget -> null = corr(A1, A2) = c_ours^2.
  - reference side: render a TRUTH_SCALE-times-longer reference render T
    (ours, near-truth), then c_ref ~= corr(ref, T) / c_T with
    c_T^2 = S/(S + N/TRUTH_SCALE) = TRUTH_SCALE*null /
    ((TRUTH_SCALE-1)*null + 1) (same signal/noise split as the null).

  predicted ceiling = c_ours * c_ref; a pair is EXPLAINED when the
  measured cross-correlation reaches that ceiling (within a small
  Monte-Carlo margin), and flagged CHECK otherwise — "reference shot
  noise" stops being an assumption and becomes a measurement.

Run on a TPU host (renders ~10 small images, ~15-20 min):
    python tools/parity_null.py [out_dir] [pairs...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.reference_parity import _blur3  # noqa: E402

#: Truth render budget multiplier (per-pixel noise shrinks ~sqrt of it).
TRUTH_SCALE = 6.0

#: The gallery recipes (exactly tools/generate_examples.py — the flags
#: the committed examples/ gallery and the parity table were made with).
RECIPES: dict[str, list[str]] = {}
_base = ["-w", "200", "-h", "200"]
for _g in ("1.0", "1.5", "2.2"):
    RECIPES[f"gamma_{_g.replace('.', '_')}"] = _base + [
        "-m", "10000", "-c", "8000", "-g", _g, "-t", "30",
    ]
for _m in ("100", "1000", "20000"):
    RECIPES[f"max_{_m}"] = _base + ["-m", _m, "-c", "20", "-t", "10"]
for _c in ("20", "2000", "10000"):
    RECIPES[f"cutoff_{_c}"] = _base + [
        "-m", "20000", "-c", _c, "-g", "1.8", "-t", "30",
    ]
RECIPES["cropped"] = [
    "-w", "200", "-h", "100",
    "--min-real", "0.0", "--max-real", "1.0",
    "--min-imag", "0.0", "--max-imag", "0.5",
    "-m", "2000", "-c", "100", "-g", "1.5", "-t", "20",
]


def _render(argv: list[str], seed: int, scale: float, path: str) -> None:
    import jax

    if os.environ.get("PARITY_NULL_CPU"):
        # Smoke-test escape hatch (tests/CI): env vars alone can't
        # override this sandbox's pinned axon backend.
        jax.config.update("jax_platforms", "cpu")

    from cudabrot_tpu import cli, driver
    from cudabrot_tpu.io import png as png_io
    from cudabrot_tpu.ops import tonemap as tonemap_op

    argv = list(argv)
    ti = argv.index("-t")
    budget = float(os.environ.get("PARITY_NULL_BUDGET", "1.0"))
    argv[ti + 1] = str(float(argv[ti + 1]) * scale * budget)
    argv += ["--seed", str(seed)]
    cfg, _ = cli.parse_args(argv)
    res = driver.run_render(cfg)
    mapped = tonemap_op.tonemap(jax.numpy.asarray(res.histogram), cfg.gamma)
    png_io.write_png(path, np.asarray(jax.device_get(mapped.image)))


def _corr(pa: str, pb: str) -> float:
    from cudabrot_tpu.io import png

    a = _blur3(png.read_png(pa).astype(np.float64))
    b = _blur3(png.read_png(pb).astype(np.float64))
    return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/parity_null"
    pairs = sys.argv[2:] or list(RECIPES)
    ref_dir = "/root/reference/examples"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(out_dir, exist_ok=True)

    rows = []
    for name in pairs:
        argv = RECIPES[name]
        ref = os.path.join(ref_dir, name + ".png")
        ours = os.path.join(repo, "examples", name + ".png")
        if not os.path.exists(ref):
            print(f"{name}: SKIP (no reference image)")
            continue
        a1 = os.path.join(out_dir, name + "_a.png")
        a2 = os.path.join(out_dir, name + "_b.png")
        tr = os.path.join(out_dir, name + "_t.png")
        for path, seed, scale in (
            (a1, 101, 1.0), (a2, 202, 1.0), (tr, 303, TRUTH_SCALE),
        ):
            if not os.path.exists(path):
                _render(argv, seed, scale, path)
        cross = _corr(ref, ours) if os.path.exists(ours) else _corr(ref, a1)
        null = _corr(a1, a2)
        c_ours = float(np.sqrt(max(null, 0.0)))
        # c_T from the same signal/noise split the null measures.
        c_t = float(np.sqrt(
            TRUTH_SCALE * null / ((TRUTH_SCALE - 1.0) * null + 1.0)
        )) if null > 0 else 1.0
        ref_vs_truth = _corr(ref, tr)
        c_ref = min(ref_vs_truth / max(c_t, 1e-9), 1.0)
        ceiling = c_ours * c_ref
        # EXPLAINED when the measured cross-corr reaches the noise
        # ceiling within a 2% Monte-Carlo margin.
        verdict = "EXPLAINED" if cross >= ceiling * 0.98 else "CHECK"
        rows.append((name, cross, null, ref_vs_truth, ceiling, verdict))
        print(
            f"{name:14s} cross={cross:.4f} null(ours)={null:.4f} "
            f"ref_vs_truth={ref_vs_truth:.4f} ceiling={ceiling:.4f} "
            f"{verdict}",
            flush=True,
        )

    print("\n| pair | cross | null (ours) | ref vs truth | ceiling | verdict |")
    print("|---|---|---|---|---|---|")
    for name, cross, null, rt, ceil, v in rows:
        print(f"| {name} | {cross:.4f} | {null:.4f} | {rt:.4f} "
              f"| {ceil:.4f} | {v} |")
    return 0 if rows else 1


if __name__ == "__main__":
    raise SystemExit(main())
