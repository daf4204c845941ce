"""f32 vs f64 iteration-precision study (SURVEY.md §7(c), VERDICT r1 #4).

The reference iterates in hardware double (cudabrot.cu:321, 392-393); the
TPU production kernel iterates in f32. This study measures what that
costs, per band, on real in-band samples produced by the production
kernel:

1. **Collection** (TPU or CPU-interpret): run the Pallas classify pass
   and collect in-band emissions (c, f32 escape index).
2. **Re-classification**: classify each collected c in numpy f64 and
   numpy f32 (identical code, dtype parameterized) and compare escape
   indices — P(index differs), P(band membership differs), |delta|.
3. **Replay divergence**: replay agreed samples in f32 and f64 in
   lockstep, quantize both orbits at the production color canvas pitch
   (20000x15000 over re[-2,2] im[-1.5,1.5], the
   generate_hires_color_image.sh geometry), and measure the fraction of
   orbit points that land in different bins plus the coarse-grid
   (400x300) histogram correlation between the two point streams.

Usage: python benchmarks/precision_study.py [--samples 3000] [--out md]
Writes benchmarks/precision_study.json; print a markdown table with --out md.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BANDS = [
    (1000, 8000, "medium (hires color script)"),
    (2000, 20000, "headline (README cutoff-2000)"),
    (45000, 60000, "fine (production 12h band)"),
]

# Production color canvas (generate_hires_color_image.sh:27-32).
W, H = 20000, 15000
MIN_R, MAX_R = -2.0, 2.0
MIN_I, MAX_I = -1.5, 1.5
DR = (MAX_R - MIN_R) / W
DI = (MAX_I - MIN_I) / H


def collect_samples(min_it: int, max_it: int, want: int):
    """Collect in-band (cr, ci, iters) emissions from the production
    Pallas classify pass."""
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

    # Use the classify+compact stage directly (no replay needed).
    import functools

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


def classify_np(cr, ci, max_it: int, dtype):
    """Vectorized escape-time classification with alive-set compaction
    (same math as IterateMandelbrot, cudabrot.cu:319-340; z starts at c)."""
    cr = cr.astype(dtype)
    ci = ci.astype(dtype)
    n = cr.shape[0]
    iters = np.full(n, max_it, np.int64)
    idx = np.arange(n)
    zr = cr.copy()
    zi = ci.copy()
    ccr = cr.copy()
    cci = ci.copy()
    four = dtype(4.0)
    for i in range(max_it):
        if idx.size == 0:
            break
        nzr = zr * zr - zi * zi + ccr
        nzi = 2 * zr * zi + cci
        zr, zi = nzr, nzi
        esc = (zr * zr + zi * zi) > four
        if esc.any():
            iters[idx[esc]] = i
            alive = ~esc
            idx = idx[alive]
            zr = zr[alive]
            zi = zi[alive]
            ccr = ccr[alive]
            cci = cci[alive]
    return iters


def replay_divergence(cr, ci, iters, coarse=(300, 400)):
    """Lockstep f32/f64 replay of known-escaping orbits: per-point bin
    agreement at production pitch + coarse histogram correlation."""
    n = cr.shape[0]
    zr32 = cr.astype(np.float32).copy()
    zi32 = ci.astype(np.float32).copy()
    zr64 = cr.astype(np.float64).copy()
    zi64 = ci.astype(np.float64).copy()
    cr32, ci32 = zr32.copy(), zi32.copy()
    cr64, ci64 = zr64.copy(), zi64.copy()
    lim = iters.copy()
    idx = np.arange(n)
    agree = 0
    total = 0
    first_div = np.full(n, -1, np.int64)  # step of first bin mismatch
    ch, cw = coarse
    h32 = np.zeros((ch, cw), np.int64)
    h64 = np.zeros((ch, cw), np.int64)

    def bins(zr, zi):
        ok = (zr >= MIN_R) & (zi >= MIN_I)
        col = ((zr - MIN_R) / DR).astype(np.int64)
        row = ((zi - MIN_I) / DI).astype(np.int64)
        ok &= (col >= 0) & (col < W) & (row >= 0) & (row < H)
        return np.where(ok, row * W + col, -1)

    s = 0
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
        on32 = b32 >= 0
        on64 = b64 >= 0
        np.add.at(h32, ((b32[on32] // W) * ch // H,
                        (b32[on32] % W) * cw // W), 1)
        np.add.at(h64, ((b64[on64] // W) * ch // H,
                        (b64[on64] % W) * cw // W), 1)
        done = s >= lim[idx]
        if done.any():
            keep = ~done
            idx = idx[keep]
            zr32, zi32 = zr32[keep], zi32[keep]
            zr64, zi64 = zr64[keep], zi64[keep]
            cr32, ci32 = cr32[keep], ci32[keep]
            cr64, ci64 = cr64[keep], ci64[keep]
        s += 1

    corr = float(np.corrcoef(h32.ravel(), h64.ravel())[0, 1])
    return {
        "point_bin_agreement": round(agree / max(total, 1), 6),
        "orbit_points": int(total),
        "mean_steps_to_first_bin_divergence": (
            round(float(first_div[first_div >= 0].mean()), 1)
            if (first_div >= 0).any()
            else None
        ),
        "orbits_with_any_divergence": round(
            float((first_div >= 0).mean()), 4
        ),
        "coarse_hist_corr_f32_vs_f64": round(corr, 6),
        "coarse_mass_f32": int(h32.sum()),
        "coarse_mass_f64": int(h64.sum()),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=3000)
    ap.add_argument("--replay-samples", type=int, default=1200)
    ap.add_argument("--out", default="json")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    results = []
    for min_it, max_it, label in BANDS:
        t0 = time.time()
        cr, ci, it_kernel = collect_samples(min_it, max_it, args.samples)
        n = cr.shape[0]
        i64 = classify_np(cr, ci, max_it, np.float64)
        i32 = classify_np(cr, ci, max_it, np.float32)
        in_band64 = (i64 >= min_it) & (i64 < max_it)
        in_band32 = (i32 >= min_it) & (i32 < max_it)
        diff = i64 != i32
        band_flip = in_band64 != in_band32
        rel = np.abs(i64 - i32)[diff] / np.maximum(i64[diff], 1)

        sub = slice(0, args.replay_samples)
        agreed = (i64 == i32)[sub]
        div = replay_divergence(
            cr[sub][agreed], ci[sub][agreed], i64[sub][agreed]
        )
        row = {
            "band": [min_it, max_it],
            "label": label,
            "samples": int(n),
            "escape_index_mismatch_f32_vs_f64": round(float(diff.mean()), 4),
            "band_membership_flip": round(float(band_flip.mean()), 4),
            "kernel_vs_numpy_f32_mismatch": round(
                float((it_kernel != i32).mean()), 4
            ),
            "median_rel_index_delta_when_differs": (
                round(float(np.median(rel)), 4) if diff.any() else 0.0
            ),
            **div,
            "seconds": round(time.time() - t0, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    with open("benchmarks/precision_study.json", "w") as f:
        json.dump(results, f, indent=2)

    if args.out == "md":
        print("\n| band | n | P(idx differs) | P(band flips) | "
              "bin agreement | orbits diverging | coarse corr |")
        print("|---|---|---|---|---|---|---|")
        for r in results:
            print(
                f"| {r['band'][0]}-{r['band'][1]} | {r['samples']} "
                f"| {r['escape_index_mismatch_f32_vs_f64']:.2%} "
                f"| {r['band_membership_flip']:.2%} "
                f"| {r['point_bin_agreement']:.2%} "
                f"| {r['orbits_with_any_divergence']:.2%} "
                f"| {r['coarse_hist_corr_f32_vs_f64']:.4f} |"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
