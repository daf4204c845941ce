"""Per-scale MH proposal acceptance probe.

The MH kernel's proposal (ops/pallas_kernels_mh.py _mh_propose) mutates
24-bit grid indices by +-(m24 >> sh) with the shift sh ~uniform over
{0..23}: a log-uniform multi-scale mixture. This probe measures, for
chain states already ON the target (in-band and window-visiting), the
acceptance probability E[min(1, v'/v)] as a function of the proposal
scale — the data that decides whether the scale mixture (and the
restart fraction) is sized right for a given window/domain ratio, or
whether coarse scales are dead weight that strangles mixing (silicon
A/B at a 6e-3 window measured 0.06% overall acceptance).

Usage: python benchmarks/mh_scale_probe.py [span] [domain_span]
Defaults match benchmarks/mh_ab.py's window (6e-3 at the seahorse
valley) with the full [-2,2] sample domain.
"""

from __future__ import annotations

import sys

import numpy as np

CENTER = (-0.7436, 0.1319)
MAX_IT, MIN_IT = 5000, 500


def classify_and_visits(cr, ci, wx0, wx1, wy0, wy1, max_it=MAX_IT):
    """Strict-f32 escape index + window-visit count (vectorized)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def go(cr, ci):
        def body(s, st):
            zr, zi, esc, v = st
            r2 = zr * zr
            i2 = zi * zi
            nzr = r2 - i2 + cr
            nzi = 2.0 * zr * zi + ci
            alive = esc < 0
            hit = alive & ~(nzr * nzr + nzi * nzi <= 4.0)
            esc = jnp.where(hit, s, esc)
            v = v + (
                alive
                & (nzr >= wx0) & (nzr < wx1)
                & (nzi >= wy0) & (nzi < wy1)
            ).astype(jnp.int32)
            return nzr, nzi, esc, v

        esc = jnp.full(cr.shape, -1, jnp.int32)
        v = jnp.zeros(cr.shape, jnp.int32)
        _, _, esc, v = jax.lax.fori_loop(
            0, max_it, body, (cr, ci, esc, v)
        )
        return esc, v

    esc, v = go(cr.astype(np.float32), ci.astype(np.float32))
    return np.asarray(esc), np.asarray(v)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    span = float(sys.argv[1]) if len(sys.argv) > 1 else 6e-3
    dom_span = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    cx, cy = CENTER
    wx0, wx1 = cx - span / 2, cx + span / 2
    wy0, wy1 = cy - span / 2, cy + span / 2
    dom_r0, dom_i0 = cx - dom_span / 2, cy - dom_span / 2
    if dom_span == 4.0:
        dom_r0, dom_i0 = -2.0, -2.0  # the reference's full square

    # Seed states: uniform draws, kept if in-band AND visiting — the MH
    # stationary support. Sample near the window when the full domain
    # would starve the harvest (the probe needs states, not a measure).
    rng = np.random.default_rng(99)
    seeds_r, seeds_i, seeds_v = [], [], []
    harvest_span = min(dom_span, 16 * span)
    batches = 0
    while sum(len(s) for s in seeds_r) < 400 and batches < 40:
        n = 1 << 17
        cr = rng.uniform(
            cx - harvest_span / 2, cx + harvest_span / 2, n
        ).astype(np.float32)
        ci = rng.uniform(
            cy - harvest_span / 2, cy + harvest_span / 2, n
        ).astype(np.float32)
        esc, v = classify_and_visits(cr, ci, wx0, wx1, wy0, wy1)
        keep = (esc >= MIN_IT) & (esc < MAX_IT) & (v > 0)
        seeds_r.append(cr[keep])
        seeds_i.append(ci[keep])
        seeds_v.append(v[keep])
        batches += 1
    cr0 = np.concatenate(seeds_r)[:400]
    ci0 = np.concatenate(seeds_i)[:400]
    v0 = np.concatenate(seeds_v)[:400].astype(np.float64)
    print(
        f"seeds: {len(cr0)} in-band+visiting states "
        f"(harvest window {harvest_span:g}, v median {np.median(v0):g})"
    )
    if len(cr0) == 0:
        return

    # Per-scale acceptance: mutate both axes by +-(m24 >> sh) grid
    # steps (grid = dom_span / 2^24, the kernel's 24-bit lattice),
    # K draws per state per scale.
    K = 8
    grid = dom_span / (1 << 24)
    print(f"{'sh':>3s} {'step(grid)':>12s} {'P(in-band&v>0)':>15s} "
          f"{'E[min(1,v_p/v)]':>16s}")
    rows = []
    for sh in range(24):
        m = rng.integers(0, 1 << 24, (K, len(cr0)))
        off_r = (m >> sh) * np.where(rng.random((K, len(cr0))) < 0.5, -1, 1)
        m2 = rng.integers(0, 1 << 24, (K, len(cr0)))
        off_i = (m2 >> sh) * np.where(
            rng.random((K, len(cr0))) < 0.5, -1, 1
        )
        pr = (cr0[None, :] + off_r * grid).astype(np.float32).ravel()
        pi = (ci0[None, :] + off_i * grid).astype(np.float32).ravel()
        esc, v = classify_and_visits(pr, pi, wx0, wx1, wy0, wy1)
        ok = (esc >= MIN_IT) & (esc < MAX_IT) & (v > 0)
        vp = np.where(ok, v, 0).reshape(K, len(cr0)).astype(np.float64)
        acc = np.minimum(1.0, vp / v0[None, :]).mean()
        rows.append((sh, float(ok.mean()), float(acc)))
        print(f"{sh:3d} {2 ** (24 - sh):12d} {ok.mean():15.4f} "
              f"{acc:16.4f}")
    # Summary: acceptance of the kernel's current uniform-scale mixture
    # vs a fine-scales-only mixture.
    accs = np.array([r[2] for r in rows])
    print(f"uniform-scale mixture acceptance: {accs.mean():.4f}")
    print(f"finest 8 scales only:            {accs[-8:].mean():.4f}")


if __name__ == "__main__":
    main()
