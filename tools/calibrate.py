"""One-shot machine-calibration probe for the engine cost models.

Measures, on the CURRENT host + attached chip, the constants that the
band-adaptive tuner and the big-canvas hybrid-share solver consume
(cudabrot_tpu.utils.calibration — see its docstring for why calibration
is opt-in rather than implicit):

  1. classify kernel (c_inner, c_boundary) per-lane-step costs, fit from
     raw rates at two inner-window sizes (slope methodology:
     benchmarks/tracking_ab.py);
  2. native host replay points/s on an LLC-resident (1000^2) and a
     DRAM-bound (default 16000x12000) histogram, with the worker's own
     auto thread count;
  3. device blocked-replay end-to-end points/s at the big canvas
     (TPU only; skipped — defaults kept — on other backends).

Writes the JSON file that `--calibration <file>` /
`CUDABROT_TPU_CALIBRATION` installs. Runtime ~1-3 minutes on a warm
cache; pass --quick to skip the DRAM/device probes (LLC + step costs
only).

Usage: python tools/calibrate.py [-o calibration.json] [--quick]
           [--big-canvas WxH] [--modes thin_threefry[,step,thin_hardware]]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import time


def _measure_classify_rate(unroll: int, thin: bool, rng: str,
                           passes: int = 6) -> float:
    """Raw classify lane-steps/s at window size ``unroll`` (slope between
    N and 2N timed runs cancels dispatch overhead)."""
    import jax
    import jax.numpy as jnp

    from cudabrot_tpu.models import fractals
    from cudabrot_tpu.ops import pallas_kernels as pk

    fractal = fractals.get_fractal("buddhabrot")
    lane_rows = 64
    lanes = lane_rows * 128
    steps = 1 << 18
    flush = 1 << 12
    interpret = jax.default_backend() != "tpu"
    min_it, max_it = 2000, 20000

    @functools.partial(jax.jit, donate_argnums=0)
    def step_fn(state, pass_index):
        seed = jax.random.bits(
            jax.random.fold_in(jax.random.key(1337), pass_index),
            (), jnp.uint32,
        )
        bits = None
        if interpret:
            chunks = steps // flush
            windows = flush // unroll
            bits = jax.random.bits(
                jax.random.fold_in(jax.random.key(7), pass_index),
                (chunks, windows, 2, lane_rows, 128), jnp.uint32)
        r = pk.classify_pass(
            pk.LaneState(*state), seed, bits,
            fractal=fractal,
            min_it=min_it, max_it=max_it,
            steps_per_pass=steps,
            steps_per_flush=flush,
            cycle_detection=True, interpret=interpret,
            inner_unroll=unroll, thin_tracking=thin,
            rng=None if interpret else rng,
        )
        return tuple(r.state), jnp.sum(r.emit_it) + jnp.sum(r.stats)

    def run(n: int, offset: int) -> float:
        state = tuple(pk.init_lane_state(lane_rows))
        acc = None
        for p in range(2):
            state, acc = step_fn(state, p + offset)
        _ = float(jnp.asarray(acc).sum())
        t0 = time.perf_counter()
        for p in range(n):
            state, acc = step_fn(state, 100 + p + offset)
        _ = float(jnp.asarray(acc).sum())
        return time.perf_counter() - t0

    t1 = run(passes, 0)
    t2 = run(2 * passes, 1000)
    dt = max(t2 - t1, 1e-9)
    return passes * steps * lanes / dt


def _fit_step_cost(mode: str) -> tuple[float, float]:
    """Fit (c_inner, c_boundary) from rates at two window sizes."""
    thin = mode.startswith("thin")
    rng = "hardware" if mode.endswith("hardware") else "threefry"
    u_lo, u_hi = (4, 16) if thin else (1, 4)
    r_lo = _measure_classify_rate(u_lo, thin, rng)
    r_hi = _measure_classify_rate(u_hi, thin, rng)
    inv_lo, inv_hi = 1.0 / r_lo, 1.0 / r_hi
    c_b = (inv_lo - inv_hi) / (1.0 / u_lo - 1.0 / u_hi)
    c_b = max(c_b, 0.0)
    c_i = max(inv_hi - c_b / u_hi, 1e-13)
    print(f"  {mode}: U={u_lo} {r_lo:.3e} steps/s, U={u_hi} {r_hi:.3e} "
          f"-> c_inner {c_i:.2e} c_boundary {c_b:.2e}")
    return c_i, c_b


def _measure_extended_rate(unroll: int, passes: int = 6) -> float:
    """Raw df32 (extended-precision) classify lane-steps/s at window
    size ``unroll`` — slope methodology like _measure_classify_rate."""
    import jax
    import jax.numpy as jnp

    from cudabrot_tpu.models import fractals
    from cudabrot_tpu.ops import pallas_kernels_ext as pke

    fractal = fractals.get_fractal("buddhabrot")
    lane_rows = 64
    lanes = lane_rows * 128
    steps = 1 << 15
    flush = 1 << 12
    interpret = jax.default_backend() != "tpu"
    # A deep sample window — the mode's actual workload shape.
    cx, cy = -0.743643887037151, 0.131825904205330
    win = (cx - 5e-6, cx + 5e-6, cy - 5e-6, cy + 5e-6)

    @functools.partial(jax.jit, donate_argnums=0)
    def step_fn(state, pass_index):
        seed = jax.random.bits(
            jax.random.fold_in(jax.random.key(1337), pass_index),
            (2,), jnp.uint32,
        )
        r = pke.classify_pass_ext(
            pke.ExtLaneState(*state), seed, None,
            fractal=fractal,
            min_it=500, max_it=20000,
            steps_per_pass=steps,
            steps_per_flush=flush,
            cycle_detection=True, interpret=interpret,
            inner_unroll=unroll,
            rng="threefry",
            sample_domain=win,
        )
        return tuple(r.state), jnp.sum(r.emit_it) + jnp.sum(r.stats)

    def run(n: int, offset: int) -> float:
        import jax.numpy as jnp

        state = tuple(pke.init_ext_lane_state(lane_rows))
        acc = None
        for p in range(2):
            state, acc = step_fn(state, p + offset)
        _ = float(jnp.asarray(acc).sum())
        t0 = time.perf_counter()
        for p in range(n):
            state, acc = step_fn(state, 100 + p + offset)
        _ = float(jnp.asarray(acc).sum())
        return time.perf_counter() - t0

    t1 = run(passes, 0)
    t2 = run(2 * passes, 1000)
    dt = max(t2 - t1, 1e-9)
    return passes * steps * lanes / dt


def _synthetic_batch(n: int, max_it: int, min_it: int, seed: int = 0):
    """In-band escaping samples classified with the vectorized oracle.

    The band MUST resemble the consumer's workload: replay points/s is
    strongly orbit-length dependent (long orbits step locally through
    the canvas — cache-friendly; short orbits pay per-orbit setup and
    full-latency scattered misses). The hybrid-share solver applies at
    big canvases on the production medium band, so that is what the
    DRAM/device probes replay (a first cut with m=120 orbits measured
    10x below the medium band's end-to-end truth).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cudabrot_tpu.models import fractals
    from cudabrot_tpu.ops import oracle

    fm = fractals.get_fractal("buddhabrot")
    classify = jax.jit(
        lambda cr, ci: oracle.classify(fm, cr, ci, max_it)[:2]
    )
    key = jax.random.key(seed)
    crs, cis, its = [], [], []
    have = 0
    while have < n:
        key, k = jax.random.split(key)
        cr, ci = oracle.draw_samples(k, 1 << 21, jnp.float32)
        iters, escaped = classify(cr, ci)
        m = np.asarray(escaped & (iters >= min_it))
        crs.append(np.asarray(cr)[m])
        cis.append(np.asarray(ci)[m])
        its.append(np.asarray(iters)[m])
        have += int(m.sum())
    cr = np.concatenate(crs)[:n].astype(np.float32)
    ci = np.concatenate(cis)[:n].astype(np.float32)
    it = np.concatenate(its)[:n].astype(np.int32)
    return cr, ci, it


def _measure_host_rate(canvas, cr, ci, iters, threads: int,
                       reps: int = 3) -> float:
    import numpy as np

    from cudabrot_tpu.io import native

    hist = np.zeros(canvas.shape, np.uint32)
    kw = dict(width=canvas.width, height=canvas.height,
              min_real=canvas.min_real, min_imag=canvas.min_imag,
              delta_real=canvas.delta_real, delta_imag=canvas.delta_imag,
              num_threads=threads)
    native.replay_scatter(cr[:4096], ci[:4096], iters[:4096], hist, **kw)
    pts = int((iters.astype(np.int64) + 1).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        native.replay_scatter(cr, ci, iters, hist, **kw)
    return reps * pts / (time.perf_counter() - t0)


def _measure_device_rate(canvas, cr, ci, iters, reps: int = 3) -> float:
    """End-to-end blocked device replay (the hybrid path's rate)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cudabrot_tpu.engines.pallas_engine import _blocked_replay
    from cudabrot_tpu.models import fractals

    order = np.argsort(-iters)  # descending length, as the engine feeds it
    cr, ci, iters = cr[order], ci[order], iters[order]
    block = 1024
    k = (len(cr) // block) * block
    cr, ci, iters = cr[:k], ci[:k], iters[:k]
    fractal = fractals.get_fractal("buddhabrot")

    @jax.jit
    def run(hist_flat, cr, ci, it):
        return _blocked_replay(
            hist_flat, cr, ci, it, fractal=fractal, canvas=canvas,
            chunk=1024, block=block, backend="xla",
        )

    hist = jnp.zeros(canvas.num_pixels, jnp.uint32)
    dcr, dci, dit = jnp.asarray(cr), jnp.asarray(ci), jnp.asarray(iters)
    hist = run(hist, dcr, dci, dit)
    jax.block_until_ready(hist)
    pts = int((iters.astype(np.int64) + 1).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        hist = run(hist, dcr, dci, dit)
    jax.block_until_ready(hist)
    return reps * pts / (time.perf_counter() - t0)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="calibration.json")
    ap.add_argument("--quick", action="store_true",
                    help="skip the DRAM-canvas and device probes")
    ap.add_argument("--big-canvas", default="16000x12000")
    ap.add_argument("--modes", default="thin_threefry",
                    help="comma list: thin_threefry, step, thin_hardware")
    ap.add_argument("--extended", action="store_true",
                    help="also measure the df32 deep-zoom inner-step "
                    "cost multiplier (extended_step_factor)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()

    import numpy as np  # noqa: F401  (used via helpers)

    from cudabrot_tpu.config import Canvas
    from cudabrot_tpu.engines.host_replay import HostReplayWorker
    from cudabrot_tpu.io import native
    from cudabrot_tpu.utils import calibration

    updates: dict = {}
    backend = jax.default_backend()
    print(f"Calibrating on backend={backend} ...")
    if backend != "tpu":
        print("  (non-TPU backend: classify/device numbers describe this "
              "backend, not a chip — use --calibration only on the same "
              "backend you calibrated)")

    print("classify step costs:")
    field_by_mode = {
        "thin_threefry": "step_cost_thin_threefry",
        "step": "step_cost_step",
        "thin_hardware": "step_cost_thin_hardware",
    }
    for mode in args.modes.split(","):
        mode = mode.strip()
        if mode not in field_by_mode:
            raise SystemExit(f"unknown mode {mode!r}")
        updates[field_by_mode[mode]] = _fit_step_cost(mode)

    if args.extended:
        # Fit the df32 (c_inner, c_boundary) like _fit_step_cost, then
        # express the INNER-step cost as a multiplier over the f32 thin
        # fit (a plain U=16 rate ratio conflates boundary amortization:
        # measured 4.2x rate ratio where the true c_i ratio is ~10x).
        r4 = _measure_extended_rate(4)
        r16 = _measure_extended_rate(16)
        inv4, inv16 = 1.0 / r4, 1.0 / r16
        cb_ext = max((inv4 - inv16) / (1.0 / 4 - 1.0 / 16), 0.0)
        ci_ext = max(inv16 - cb_ext / 16, 1e-13)
        ci_f32 = updates.get(
            "step_cost_thin_threefry",
            calibration.active().step_cost_thin_threefry,
        )[0]
        factor = max(ci_ext / max(ci_f32, 1e-13), 1.0)
        updates["extended_step_factor"] = factor
        print(f"  extended (df32): U=4 {r4:.3e} U=16 {r16:.3e} steps/s "
              f"-> c_inner {ci_ext:.2e} ({factor:.1f}x f32) "
              f"c_boundary {cb_ext:.2e}")

    if native.available():
        # The worker's auto thread resolution defines the effective rate.
        threads = HostReplayWorker(
            Canvas(width=8, height=8), burning_ship=False
        ).num_threads
        print(f"host replay (threads={threads}):")
        # Production medium band (generate_hires_color_image.sh:43-48):
        # the regime where the hybrid share these rates feed applies.
        batch = _synthetic_batch(1 << 13, 8000, 1000)
        cr, ci, it = batch
        llc = _measure_host_rate(Canvas(width=1000, height=1000),
                                 cr, ci, it, threads)
        updates["host_replay_llc_rate"] = llc
        print(f"  LLC (1000^2): {llc:.3e} pts/s")
        if not args.quick:
            w, h = (int(x) for x in args.big_canvas.split("x"))
            big = Canvas(width=w, height=h)
            dram = _measure_host_rate(big, cr, ci, it, threads)
            updates["host_replay_dram_rate"] = dram
            print(f"  DRAM ({w}x{h}): {dram:.3e} pts/s")
    else:
        batch = None
        print("host replay: native library unavailable, keeping defaults")

    if not args.quick and backend == "tpu":
        w, h = (int(x) for x in args.big_canvas.split("x"))
        big = Canvas(width=w, height=h)
        cr, ci, it = batch or _synthetic_batch(1 << 13, 8000, 1000)
        dev = _measure_device_rate(big, cr, ci, it)
        updates["device_replay_rate"] = dev
        print(f"device blocked replay ({w}x{h}): {dev:.3e} pts/s")

    cal = dataclasses.replace(
        calibration.DEFAULT, source=f"tools/calibrate.py backend={backend}",
        **updates,
    )
    calibration.save(args.output, cal)
    print(f"wrote {args.output}")
    print("activate with: --calibration", args.output,
          "(or CUDABROT_TPU_CALIBRATION)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
