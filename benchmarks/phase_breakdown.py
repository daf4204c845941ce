"""Per-phase timing breakdown of the Pallas engine pass (VERDICT r1 #2).

Measures, at a given iteration band, the marginal per-pass cost of each
pipeline phase by building jitted steps that stop after successive stages:

  A  classify            classify_pass only (lane state carried)
  B  +compact            A + full-buffer argsort compaction + take(k)
  C  +payload            B + payload stack (the host-replay pass, no
                         device replay)
  D  +device-replay      B + blocked device replay of the full batch
                         (the `core` path)
  E  host replay rate    native C++ replay throughput on a synthetic
                         batch drawn from the band's orbit-length
                         distribution (measured separately, no TPU)

Methodology per the repo's environment rules: passes are dispatched
back-to-back (pipelined) and timing uses the slope between N and 2N
passes, with forced scalar materialization — block_until_ready through
the tunnel is unreliable.

Usage: python benchmarks/phase_breakdown.py [--min 2000] [--max 20000]
           [--passes 8] [--phases ABCDE]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def build(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=int, default=2000)
    ap.add_argument("--max", type=int, default=20000)
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--phases", default="ABCDE")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lane-rows", type=int, default=0)
    ap.add_argument("--steps", type=int, default=0,
                    help="override steps_per_pass (0 = auto-tune)")
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = build(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    import jax.numpy as jnp

    from cudabrot_tpu.config import (
        Canvas, EngineOptions, IterationBand, RenderConfig,
    )
    from cudabrot_tpu.engines import pallas_engine as pe
    from cudabrot_tpu.models import fractals
    from cudabrot_tpu.ops import pallas_kernels as pk

    opt = {}
    if args.lane_rows:
        opt["lane_rows"] = args.lane_rows
    if args.steps:
        opt["steps_per_pass"] = args.steps
    cfg = RenderConfig(
        canvas=Canvas(width=1000, height=1000),
        band=IterationBand(max_escape_iterations=args.max,
                           min_escape_iterations=args.min),
        options=EngineOptions(**opt),
    )
    tn = pe.Tuning(cfg)
    fractal = fractals.get_fractal(cfg.fractal)
    lane_rows = cfg.options.lane_rows
    lanes = lane_rows * 128
    interpret = jax.default_backend() != "tpu"
    buffer = (tn.steps_per_pass // tn.steps_per_flush) * lanes
    k = min(tn.replay_capacity, buffer)
    block = min(tn.replay_block, k)
    results = {
        "band": [args.min, args.max],
        "steps_per_pass": tn.steps_per_pass,
        "steps_per_flush": tn.steps_per_flush,
        "lanes": lanes,
        "replay_capacity": k,
        "lane_steps_per_pass": tn.steps_per_pass * lanes,
    }

    def classify(state, pass_index):
        seed = jax.random.bits(
            jax.random.fold_in(jax.random.key(cfg.seed), pass_index),
            (), jnp.uint32,
        )
        bits = None
        if interpret:
            chunks = tn.steps_per_pass // tn.steps_per_flush
            windows = tn.steps_per_flush // tn.inner_unroll
            bits = jax.random.bits(
                jax.random.fold_in(jax.random.key(7), pass_index),
                (chunks, windows, 2, lane_rows, 128), jnp.uint32)
        return pk.classify_pass(
            pk.LaneState(*state), seed, bits,
            fractal=fractal,
            min_it=args.min, max_it=args.max,
            steps_per_pass=tn.steps_per_pass,
            steps_per_flush=tn.steps_per_flush,
            cycle_detection=True, interpret=interpret,
            inner_unroll=tn.inner_unroll,
        )

    def compact(result):
        em_it = result.emit_it.reshape(-1)
        em_cr = result.emit_c[:, 0].reshape(-1)
        em_ci = result.emit_c[:, 1].reshape(-1)
        valid = em_it >= 0
        order = jnp.argsort(jnp.where(valid, -em_it, 1))
        take = order[:k]
        it_c = jnp.where(valid[take], em_it[take], -1)
        return em_cr[take], em_ci[take], it_c

    @functools.partial(jax.jit, donate_argnums=0)
    def step_a(state, pass_index):
        r = classify(state, pass_index)
        # Consume emissions into a scalar so nothing is DCE'd.
        return tuple(r.state), jnp.sum(r.emit_it)

    @functools.partial(jax.jit, donate_argnums=0)
    def step_b(state, pass_index):
        r = classify(state, pass_index)
        cr, ci, it = compact(r)
        return tuple(r.state), jnp.sum(it) + jnp.sum(cr) + jnp.sum(ci)

    @functools.partial(jax.jit, donate_argnums=0)
    def step_c(state, pass_index):
        r = classify(state, pass_index)
        cr, ci, it = compact(r)
        payload = jnp.stack([cr, ci, it.astype(jnp.float32)])
        n_valid = jnp.sum(it >= 0).astype(jnp.int32)
        return tuple(r.state), jnp.sum(payload) + n_valid

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_d(state, hist, pass_index):
        r = classify(state, pass_index)
        cr, ci, it = compact(r)
        hist, _ = pe._blocked_replay(
            hist, cr, ci, it,
            fractal=fractal, canvas=cfg.canvas,
            chunk=tn.replay_chunk, block=block,
            backend="xla",
        )
        return tuple(r.state), hist, jnp.sum(it)

    def run(step, with_hist: bool, n: int, offset: int):
        state = tuple(pk.init_lane_state(lane_rows))
        hist = jnp.zeros(cfg.canvas.num_pixels, jnp.uint32)
        acc = None
        # warmup/compile + lane-state steady state
        for p in range(2):
            if with_hist:
                state, hist, acc = step(state, hist, p + offset)
            else:
                state, acc = step(state, p + offset)
        _ = float(jnp.asarray(acc).sum())
        t0 = time.perf_counter()
        for p in range(n):
            if with_hist:
                state, hist, acc = step(state, hist, 100 + p + offset)
            else:
                state, acc = step(state, 100 + p + offset)
        _ = float(jnp.asarray(acc).sum())
        return time.perf_counter() - t0

    def slope(step, with_hist=False, offset=0):
        n = args.passes
        t1 = run(step, with_hist, n, offset)
        t2 = run(step, with_hist, 2 * n, offset + 1000)
        return (t2 - t1) / n, t1 / n, t2 / (2 * n)

    steps_per_pass = tn.steps_per_pass * lanes
    for phase, (fn, with_hist) in {
        "A": (step_a, False),
        "B": (step_b, False),
        "C": (step_c, False),
        "D": (step_d, True),
    }.items():
        if phase not in args.phases:
            continue
        per_pass, lo, hi = slope(fn, with_hist)
        results[phase] = {
            "seconds_per_pass": round(per_pass, 4),
            "bounds": [round(lo, 4), round(hi, 4)],
            "lane_steps_per_sec": round(steps_per_pass / per_pass, 1),
        }
        print(json.dumps({"phase": phase, **results[phase]}), flush=True)

    if "E" in args.phases:
        from cudabrot_tpu.io import native

        if native.available():
            rng = np.random.default_rng(0)
            nb = 16384
            # Orbit lengths ~ 1/t^2 density truncated to the band.
            u = rng.random(nb)
            mi, ma = max(args.min, 2), args.max
            t = 1.0 / (1.0 / mi - u * (1.0 / mi - 1.0 / ma))
            iters = t.astype(np.int32)
            # Random in-band-ish c values: replay cost is per-iteration
            # regardless of c; use points near the boundary.
            ang = rng.random(nb) * 2 * np.pi
            cr = (-0.5 + 0.8 * np.cos(ang)).astype(np.float32)
            ci = (0.8 * np.sin(ang)).astype(np.float32)
            hist = np.zeros(cfg.canvas.shape, np.uint32)
            cv = cfg.canvas
            t0 = time.perf_counter()
            hits, points = native.replay_scatter(
                cr, ci, iters, hist,
                width=cv.width, height=cv.height,
                min_real=cv.min_real, min_imag=cv.min_imag,
                delta_real=cv.delta_real, delta_imag=cv.delta_imag,
                burning_ship=False, num_threads=0,
            )
            dt = time.perf_counter() - t0
            results["E"] = {
                "points": int(points),
                "seconds": round(dt, 4),
                "points_per_sec": round(points / dt, 1),
            }
            print(json.dumps({"phase": "E", **results["E"]}), flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
