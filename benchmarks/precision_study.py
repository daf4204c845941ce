"""f32 vs f64 iteration-precision study (SURVEY.md §7(c), VERDICT r1 #4).

The reference iterates in hardware double (cudabrot.cu:321, 392-393); the
TPU production kernel iterates in f32. Individual long orbits CANNOT agree
across precisions — the Mandelbrot map is chaotic, so a 2^-24 rounding
perturbation grows exponentially and the trajectories decorrelate after a
few hundred steps (measured below; f64 likewise decorrelates from exact
arithmetic, just ~2x later). Per-orbit equivalence is therefore the wrong
criterion. The renderer is a Monte-Carlo estimator of an invariant
measure: what must match between precisions is the *distribution* of
escape times and of binned orbit points. This study measures:

  A. **Divergence mechanism**: lockstep f32/f64 replay of production
     in-band samples — steps until the orbits first land in different
     bins at the production canvas pitch (20000x15000 over re[-2,2]
     im[-1.5,1.5], generate_hires_color_image.sh geometry).
  B. **Escape-time distribution**: classify one common uniform c stream
     in both precisions (numpy, identical code, dtype-parameterized,
     Brent cycle detection for interior points); compare band fractions
     (with 95% Wilson CIs) and the Kolmogorov-Smirnov distance between
     conditional escape-time distributions.
  C. **Image-level**: render the same configuration with the oracle
     engine in f32 and in f64 (independent RNG streams) and compare the
     converged histograms — total mass ratio and per-pixel correlation.

Usage: python benchmarks/precision_study.py [--out md]
Writes benchmarks/precision_study.json.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# Production color canvas (generate_hires_color_image.sh:27-32).
W, H = 20000, 15000
MIN_R, MAX_R = -2.0, 2.0
MIN_I, MAX_I = -1.5, 1.5
DR = (MAX_R - MIN_R) / W
DI = (MAX_I - MIN_I) / H


def collect_samples(min_it: int, max_it: int, want: int):
    """Collect in-band (cr, ci, f32-escape-index) emissions from the
    production Pallas classify pass."""
    import functools

    import jax
    import jax.numpy as jnp

    from cudabrot_tpu.config import Canvas, IterationBand, RenderConfig
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    cfg = RenderConfig(
        canvas=Canvas(width=1000, height=1000),
        band=IterationBand(max_escape_iterations=max_it,
                           min_escape_iterations=min_it),
    )
    eng = PallasEngine(cfg, replay_mode="device")
    state = eng.init_state(None)

    @functools.partial(jax.jit, donate_argnums=0)
    def pass_fn(state, pass_index):
        new_state, (cr, ci, it) = eng._classify_and_compact(
            state, pass_index, jnp.uint32(0)
        )
        return new_state, (cr, ci, it)

    crs, cis, its = [], [], []
    total = 0
    p = 0
    while total < want and p < 200:
        state, (cr, ci, it) = pass_fn(state, p)
        it_np = np.asarray(it)
        keep = it_np >= 0
        crs.append(np.asarray(cr)[keep])
        cis.append(np.asarray(ci)[keep])
        its.append(it_np[keep])
        total += int(keep.sum())
        p += 1
    cr = np.concatenate(crs)[:want]
    ci = np.concatenate(cis)[:want]
    it = np.concatenate(its)[:want]
    return cr.astype(np.float32), ci.astype(np.float32), it.astype(np.int64)


def classify_np(cr, ci, max_it: int, dtype, brent: bool = True):
    """Vectorized escape-time classification with alive-set compaction
    (IterateMandelbrot semantics, cudabrot.cu:319-340; z starts at c).
    Interior points are retired early via Brent cycle detection (exact
    f32/f64 periodicity of attracting cycles) and report max_it, exactly
    like the production kernel's interior handling."""
    cr = np.asarray(cr, dtype)
    ci = np.asarray(ci, dtype)
    n = cr.shape[0]
    iters = np.full(n, max_it, np.int64)
    idx = np.arange(n)
    zr = cr.copy()
    zi = ci.copy()
    ccr = cr.copy()
    cci = ci.copy()
    four = dtype(4.0)
    big = dtype(1e30)
    sr = np.full(n, big, dtype)[: n]
    si = np.full(n, big, dtype)
    sr = np.full(n, big, dtype)
    sv = np.full(n, 16, np.int64)
    for i in range(max_it):
        if idx.size == 0:
            break
        nzr = zr * zr - zi * zi + ccr
        nzi = 2 * zr * zi + cci
        zr, zi = nzr, nzi
        esc = (zr * zr + zi * zi) > four
        drop = esc
        if brent:
            cyc = (zr == sr) & (zi == si) & ~esc
            drop = esc | cyc
            at_save = (i + 1 >= sv) & ~drop
            if at_save.any():
                sr = np.where(at_save, zr, sr)
                si = np.where(at_save, zi, si)
                sv = np.where(at_save, sv * 2, sv)
        if drop.any():
            iters[idx[esc]] = i  # cycled lanes keep max_it (interior)
            alive = ~drop
            idx = idx[alive]
            zr = zr[alive]
            zi = zi[alive]
            ccr = ccr[alive]
            cci = cci[alive]
            if brent:
                sr = sr[alive]
                si = si[alive]
                sv = sv[alive]
    return iters


def divergence_mechanism(cr, ci, iters):
    """Lockstep f32/f64 replay: distribution of steps until the two
    trajectories first land in different production-pitch bins."""
    n = cr.shape[0]
    zr32 = cr.astype(np.float32).copy()
    zi32 = ci.astype(np.float32).copy()
    zr64 = cr.astype(np.float64).copy()
    zi64 = ci.astype(np.float64).copy()
    cr32, ci32 = zr32.copy(), zi32.copy()
    cr64, ci64 = zr64.copy(), zi64.copy()
    lim = iters.copy()
    idx = np.arange(n)
    first_div = np.full(n, -1, np.int64)

    def bins(zr, zi):
        ok = (zr >= MIN_R) & (zi >= MIN_I)
        col = ((zr - MIN_R) / DR).astype(np.int64)
        row = ((zi - MIN_I) / DI).astype(np.int64)
        ok &= (col >= 0) & (col < W) & (row >= 0) & (row < H)
        return np.where(ok, row * W + col, -1)

    s = 0
    agree = total = 0
    while idx.size:
        nzr32 = zr32 * zr32 - zi32 * zi32 + cr32
        nzi32 = np.float32(2) * zr32 * zi32 + ci32
        zr32, zi32 = nzr32, nzi32
        nzr64 = zr64 * zr64 - zi64 * zi64 + cr64
        nzi64 = 2.0 * zr64 * zi64 + ci64
        zr64, zi64 = nzr64, nzi64
        b32 = bins(zr32.astype(np.float64), zi32.astype(np.float64))
        b64 = bins(zr64, zi64)
        same = b32 == b64
        agree += int(same.sum())
        total += idx.size
        newly = ~same & (first_div[idx] < 0)
        first_div[idx[newly]] = s
        done = s >= lim[idx]
        if done.any():
            keep = ~done
            idx = idx[keep]
            zr32, zi32 = zr32[keep], zi32[keep]
            zr64, zi64 = zr64[keep], zi64[keep]
            cr32, ci32 = cr32[keep], ci32[keep]
            cr64, ci64 = cr64[keep], ci64[keep]
        s += 1

    div = first_div[first_div >= 0]
    return {
        "orbits": int(n),
        "orbits_reaching_bin_divergence": round(float((first_div >= 0).mean()), 4),
        "steps_to_first_bin_divergence_p50": int(np.median(div)) if div.size else None,
        "steps_to_first_bin_divergence_p10": int(np.percentile(div, 10)) if div.size else None,
        "steps_to_first_bin_divergence_p90": int(np.percentile(div, 90)) if div.size else None,
    }


def wilson_ci(k: int, n: int, z: float = 1.96):
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    d = 1 + z * z / n
    center = (p + z * z / (2 * n)) / d
    half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / d
    return (max(center - half, 0.0), min(center + half, 1.0))


def escape_distribution(n_samples: int, max_it: int, bands, seed=20260816):
    """Classify one common uniform c stream in f32 and f64; compare band
    fractions and the conditional escape-time distributions."""
    rng = np.random.default_rng(seed)
    cr = (rng.random(n_samples) * 4.0 - 2.0).astype(np.float32)
    ci = (rng.random(n_samples) * 4.0 - 2.0).astype(np.float32)
    # Cardioid/bulb cull (closed-form, on identical c values;
    # cudabrot.cu:284-298) — culled points are strictly interior in both
    # precisions, so skipping them does not affect escaper statistics.
    q = (cr - 0.25) ** 2 + ci**2
    card = q * (q + (cr - 0.25)) < 0.25 * ci**2
    bulb = (cr + 1.0) ** 2 + ci**2 < 0.0625
    keep = ~(card | bulb)
    cr, ci = cr[keep], ci[keep]

    t32 = classify_np(cr, ci, max_it, np.float32)
    t64 = classify_np(cr, ci, max_it, np.float64)

    out = {"samples_classified": int(cr.shape[0]), "bands": []}
    for mi, ma in bands:
        k32 = int(((t32 >= mi) & (t32 < ma)).sum())
        k64 = int(((t64 >= mi) & (t64 < ma)).sum())
        n = cr.shape[0]
        lo32, hi32 = wilson_ci(k32, n)
        lo64, hi64 = wilson_ci(k64, n)
        out["bands"].append({
            "band": [mi, ma],
            "in_band_f32": k32,
            "in_band_f64": k64,
            "frac_f32": k32 / n,
            "frac_f64": k64 / n,
            "ci_overlap": bool(not (hi32 < lo64 or hi64 < lo32)),
        })
    # KS distance between conditional escape-time distributions
    # (escapers with t >= 100 — the regime where chaos has set in).
    e32 = np.sort(t32[(t32 >= 100) & (t32 < max_it)])
    e64 = np.sort(t64[(t64 >= 100) & (t64 < max_it)])
    if e32.size and e64.size:
        allv = np.union1d(e32, e64)
        c32 = np.searchsorted(e32, allv, "right") / e32.size
        c64 = np.searchsorted(e64, allv, "right") / e64.size
        ks = float(np.abs(c32 - c64).max())
        # two-sample KS 95% critical value
        crit = 1.358 * np.sqrt((e32.size + e64.size) / (e32.size * e64.size))
        out["ks"] = {
            "n_f32": int(e32.size),
            "n_f64": int(e64.size),
            "statistic": round(ks, 5),
            "crit_95": round(float(crit), 5),
            "pass": bool(ks < crit),
        }
    return out


def image_level(min_it: int, max_it: int, passes: int, size=256):
    """Oracle render in f32 vs f64 (independent Monte-Carlo streams):
    total-mass ratio and per-pixel correlation of the histograms."""
    import subprocess
    import sys
    import tempfile
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = """
import sys, json
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
precision, seed, mi, ma, passes, size, out = sys.argv[1:8]
from cudabrot_tpu.config import Canvas, EngineOptions, IterationBand, RenderConfig
from cudabrot_tpu import engines
cfg = RenderConfig(
    canvas=Canvas(width=int(size), height=int(size)),
    band=IterationBand(max_escape_iterations=int(ma), min_escape_iterations=int(mi)),
    seed=int(seed),
    options=EngineOptions(engine='oracle', precision=precision,
                          oracle_samples_per_pass=1 << 16),
)
eng = engines.make_engine(cfg)
state = eng.init_state(None)
for p in range(int(passes)):
    state = eng.run_pass(state, p)
np.save(out, eng.histogram(state))
"""
    # Matched-noise design: two independent f32 renders plus one f64
    # render. f32 is statistically equivalent to f64 iff the f32<->f64
    # distance is indistinguishable from the f32<->f32 distance (both are
    # then pure Monte-Carlo shot noise).
    with tempfile.TemporaryDirectory() as td:
        hists = {}
        for name, prec, seed in (
            ("f32a", "float32", 1),
            ("f32b", "float32", 3),
            ("f64", "float64", 2),
        ):
            out = os.path.join(td, name + ".npy")
            env = dict(os.environ)
            env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
            r = subprocess.run(
                [sys.executable, "-c", code, prec, str(seed),
                 str(min_it), str(max_it), str(passes), str(size), out],
                env=env, capture_output=True, text=True, timeout=3000,
            )
            if r.returncode != 0:
                raise RuntimeError(r.stderr[-2000:])
            hists[name] = np.load(out).astype(np.float64)

    def corr(a, b):
        return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])

    a, b, d = hists["f32a"], hists["f32b"], hists["f64"]
    return {
        "band": [min_it, max_it],
        "canvas": size,
        "passes": passes,
        "mass_f32a": int(a.sum()),
        "mass_f32b": int(b.sum()),
        "mass_f64": int(d.sum()),
        "corr_f32_vs_f32": round(corr(a, b), 5),
        "corr_f32_vs_f64": round(min(corr(a, d), corr(b, d)), 5),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--phases", default="ABC",
                    help="A needs the TPU (interpret-mode collection is "
                         "impractically slow); B and C are CPU-only")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    results = {}
    t0 = time.time()

    # A. mechanism: production samples at the headline + fine bands.
    if "A" in args.phases:
        mech = {}
        for mi, ma, n in ((2000, 20000, 1500), (45000, 60000, 600)):
            if args.quick:
                n = min(n, 100)
            cr, ci, it = collect_samples(mi, ma, n)
            mech[f"{mi}-{ma}"] = divergence_mechanism(cr, ci, it)
            print(json.dumps({"mechanism": mech[f"{mi}-{ma}"],
                              "band": [mi, ma]}), flush=True)
        results["A_divergence_mechanism"] = mech

    # B. escape-time distribution on a common uniform stream.
    if "B" in args.phases:
        n_samples = 500_000 if args.quick else 8_000_000
        results["B_escape_distribution"] = escape_distribution(
            n_samples, 20000,
            bands=[(20, 100), (100, 1000), (1000, 8000), (2000, 20000)],
        )
        print(json.dumps(results["B_escape_distribution"]), flush=True)

    # C. image-level (oracle f32 vs f64, independent streams).
    if "C" in args.phases:
        results["C_image_level"] = image_level(
            100, 1000, passes=4 if args.quick else 40
        )
        print(json.dumps(results["C_image_level"]), flush=True)

    results["total_seconds"] = round(time.time() - t0, 1)
    with open("benchmarks/precision_study.json", "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
