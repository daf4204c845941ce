"""Statistical-equivalence harness (SURVEY.md §6): renders the same
configuration with two engines (or two seeds) and reports
distribution-level agreement — chi-square on binned mass, Pearson
correlation, and per-sample rates. The reference is only statistically
reproducible (racy adds + time-boxed pass counts), so this is the
apples-to-apples comparison its outputs support.

Usage:
  python benchmarks/statistical_check.py [--w 200 --h 200 -m 500 -c 20
      --passes 4] [--engines pallas oracle] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chi_square_binned(a: np.ndarray, b: np.ndarray, min_expected=20.0):
    """Two-sample chi-square over bins with adequate mass; returns
    (statistic/dof, dof)."""
    a = a.astype(np.float64).ravel()
    b = b.astype(np.float64).ravel()
    na, nb = a.sum(), b.sum()
    keep = (a + b) * min(na, nb) / (na + nb) >= min_expected
    a, b = a[keep], b[keep]
    if a.size == 0:
        return 0.0, 0
    # Standard two-sample chi-square with unequal totals.
    k1 = np.sqrt(nb / na)
    k2 = np.sqrt(na / nb)
    stat = np.sum((k1 * a - k2 * b) ** 2 / (a + b))
    dof = a.size - 1
    return float(stat / max(dof, 1)), int(dof)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--w", type=int, default=200)
    p.add_argument("--h", dest="height", type=int, default=200)
    p.add_argument("-m", dest="max_it", type=int, default=500)
    p.add_argument("-c", dest="min_it", type=int, default=20)
    p.add_argument("--passes", type=int, default=4)
    p.add_argument(
        "--engines", nargs=2, default=["pallas", "oracle"],
        help="engine names; the spelling 'mh' selects the pallas "
        "engine with --sampler mh (pair as `--engines pallas mh "
        "--null-calibrated` so the null pair is mh-vs-mh — the MH "
        "estimator's own chain-correlated variance, not uniform's)")
    p.add_argument("--seeds", nargs=2, type=int, default=[1337, 1337])
    p.add_argument(
        "--null-calibrated", action="store_true",
        help="also run engine B at a second seed and judge the A-vs-B "
        "statistics against the B-vs-B' null pair. Necessary at deep "
        "bands: each in-band orbit deposits thousands of spatially "
        "correlated points (near-periodic orbits revisit pixels), so "
        "per-bin counts are far super-Poisson and raw chi2/dof >> 1 "
        "even for identical distributions — the unit of independence "
        "is the orbit, not the point.")
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--precision", default="float32",
        help="iteration precision for BOTH engines (extended runs df32 "
        "on pallas and float64 on the oracle — the deep-zoom QA pair)")
    p.add_argument(
        "--window", default=None, metavar="MINR,MAXR,MINI,MAXI",
        help="deep-zoom window: sets the canvas bounds AND the sample "
        "domain to the same region (the deep-zoom configuration)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cudabrot_tpu import driver
    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )

    from cudabrot_tpu.config import SAMPLE_DOMAIN

    if args.window is not None:
        r0, r1, i0, i1 = (float(v) for v in args.window.split(","))
        canvas_kw = dict(
            min_real=r0, max_real=r1, min_imag=i0, max_imag=i1
        )
        sample_domain = (r0, r1, i0, i1)
    else:
        canvas_kw = {}
        sample_domain = SAMPLE_DOMAIN

    def render(engine: str, seed: int):
        # The 'mh' spelling = pallas engine + Metropolis-Hastings
        # sampling; its histogram is in 1/256 fixed-point units
        # (normalized out below — every reported statistic is
        # distribution-level).
        sampler = "mh" if engine == "mh" else "uniform"
        cfg = RenderConfig(
            canvas=Canvas(width=args.w, height=args.height, **canvas_kw),
            band=IterationBand(
                max_escape_iterations=args.max_it,
                min_escape_iterations=args.min_it,
            ),
            sample_domain=sample_domain,
            seconds_to_run=-1.0,
            max_passes=args.passes,
            seed=seed,
            options=EngineOptions(
                engine="pallas" if engine == "mh" else engine,
                sampler=sampler,
                precision=args.precision,
                # Comparable per-pass sample volumes keep Monte-Carlo
                # noise from dominating the comparison.
                oracle_samples_per_pass=1 << 18,
            ),
        )
        res = driver.run_render(cfg, log=lambda s: None)
        scale = int(res.stats.get("weight_scale", 1))
        print(
            f"{engine}(seed={seed}): mass={res.histogram.sum() // scale} "
            f"samples={res.stats.get('samples')} "
            f"in_band={res.stats.get('in_band')}"
        )
        return res.histogram

    def stats_pair(a, b):
        pa = a.astype(np.float64) / max(a.sum(), 1)
        pb = b.astype(np.float64) / max(b.sum(), 1)
        corr = float(np.corrcoef(pa.ravel(), pb.ravel())[0, 1])
        chi, dof = chi_square_binned(a, b)
        tv = 0.5 * float(np.abs(pa - pb).sum())
        return corr, chi, dof, tv

    a = render(args.engines[0], args.seeds[0])
    b = render(args.engines[1], args.seeds[1])
    corr, chi, dof, tv = stats_pair(a, b)
    print(f"pearson_corr={corr:.5f}")
    print(f"chi2_per_dof={chi:.3f} (dof={dof}; ~1.0 = same distribution)")
    print(f"total_variation={tv:.5f}")

    if args.null_calibrated:
        # Null pair: engine B against itself at an independent seed. Any
        # real engine-level bias shows up as the CROSS statistics
        # exceeding the NULL statistics; matching them (within
        # Monte-Carlo slack) means the engines are indistinguishable at
        # this sample size regardless of how super-Poisson the per-bin
        # counts are.
        b2 = render(args.engines[1], args.seeds[1] + 777)
        ncorr, nchi, ndof, ntv = stats_pair(b, b2)
        print(f"null_pearson_corr={ncorr:.5f}")
        print(f"null_chi2_per_dof={nchi:.3f} (dof={ndof})")
        print(f"null_total_variation={ntv:.5f}")
        ok = (
            chi <= 1.5 * nchi + 1.0
            and tv <= 1.5 * ntv + 0.01
            and corr >= ncorr - 0.05
        )
    else:
        # chi2/dof near 1 means differences are consistent with
        # POISSON noise; correlation degrades when either run is
        # under-sampled, so the verdict combines both. Only valid at
        # emission-heavy bands (short orbits ~ independent points); use
        # --null-calibrated for deep bands.
        ok = corr > 0.985 and chi <= 3.0
    print("VERDICT:", "EQUIVALENT" if ok else "DIVERGENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
