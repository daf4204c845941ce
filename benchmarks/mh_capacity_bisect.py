"""Bisect the MH >2^19 replay-capacity anomaly on silicon (VERDICT r4 #4).

Two failure modes were observed when the MH emission bound crossed the
2^19 ceiling (engines/pallas_engine.py capacity clamp):
  (a) rows=128 kernel-sweep leg: deposits collapsed to ~zero;
  (b) a 2^21 bench pass hung the device (30+ min wedge).

The capacity-scaling ops are all OUTSIDE the Mosaic kernel (emission
buffers are lane-shaped): the compaction ``take = argsort(...)[:k]``
gather, the MH visit-bin gather ``em_b[:, take]`` (8 x k), and the
downstream ``mh_scatter`` (8k-id scatter-add). This probe isolates each
at k in {2^19, 2^20, 2^21} as SUBPROCESS legs with bounded timeouts,
ascending risk, each leg logged BEFORE it runs so a wedge is
attributable, then runs full tiny MH renders with --replay-capacity
forced, checking deposited mass.

Hazard protocol (CLAUDE.md): never stack retries after a timeout; the
orchestrator stops the batch at the first hang.

Usage:
  python benchmarks/mh_capacity_bisect.py            # full batch
  python benchmarks/mh_capacity_bisect.py --leg gather 20   # one leg
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

LOG = "/tmp/mh_capacity_bisect.log"


def _maybe_cpu() -> None:
    """MHCB_CPU=1 forces the CPU backend (script shakeout while the TPU
    pool is wedged; env vars alone don't work here — CLAUDE.md)."""
    import os

    if os.environ.get("MHCB_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def _logline(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


# ---------------------------------------------------------------- legs
# Each leg runs in its own subprocess (its own TPU client): a hang
# costs one bounded timeout, and the next leg starts a fresh client.


def leg_gather(k_log2: int) -> int:
    """The compaction gathers at capacity k: order[:k] on a lane-sized
    argsort, then em_b[:, take] (8, k). Verified vs numpy."""
    _maybe_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()
    k = 1 << k_log2
    lanes = 1 << 17  # 128 rows * 8 chunks * 128 lanes (kernel-sweep shape)
    rng = np.random.default_rng(5)
    em_it = jnp.asarray(
        rng.integers(-1, 1000, lanes, endpoint=True), jnp.int32
    )
    em_b = jnp.asarray(
        rng.integers(0, 1 << 20, (8, lanes)), jnp.int32
    )

    @jax.jit
    def compact(em_it, em_b):
        valid = em_it >= 0
        order = jnp.argsort(jnp.where(valid, -em_it, 1))
        take = order[:k]
        return em_b[:, take], em_it[take], jnp.sum(valid)

    t0 = time.monotonic()
    bins_c, it_c, nv = compact(em_it, em_b)
    bins_c.block_until_ready()
    dt = time.monotonic() - t0
    # numpy twin (argsort ties may order differently; compare the sorted
    # multiset of taken iteration values, which is tie-independent).
    it_np = np.asarray(em_it)
    order_np = np.argsort(np.where(it_np >= 0, -it_np, 1), kind="stable")
    take_np = order_np[: min(k, lanes)]
    got = np.sort(np.asarray(it_c))[::-1][: len(take_np)]
    want = np.sort(it_np[take_np])[::-1]
    ok = bool(np.array_equal(got, want))
    print(
        f"gather k=2^{k_log2}: {dt:.2f}s first-call, "
        f"n_valid={int(nv)}, multiset {'OK' if ok else 'MISMATCH'}",
        flush=True,
    )
    return 0 if ok else 1


def leg_scatter(k_log2: int) -> int:
    """mh_scatter at capacity k: an (8, k) visit-bin scatter with
    Bresenham weights into a 1e6-bin histogram. Mass-conservation and
    bitwise-vs-CPU checks."""
    _maybe_cpu()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cudabrot_tpu.ops import binning
    from cudabrot_tpu.utils import jaxcache

    jaxcache.enable()
    k = 1 << k_log2
    nbins = 1 << 20
    rng = np.random.default_rng(7)
    bins = jnp.asarray(rng.integers(0, nbins, (8, k)), jnp.int32)
    # t = 256*v+1 with v in [0, 64]; ~1/8 invalid (t<=1).
    v = rng.integers(0, 65, k)
    t = np.where(rng.random(k) < 0.125, 1, 256 * v + 1).astype(np.int32)
    rep = rng.integers(0, 1 << 14, k).astype(np.int32)
    t_j, rep_j = jnp.asarray(t), jnp.asarray(rep)

    fn = jax.jit(lambda h, b, t, r: binning.mh_scatter(h, b, t, r))
    t0 = time.monotonic()
    hist, deposits, mass = fn(jnp.zeros((nbins,), jnp.uint32),
                              bins, t_j, rep_j)
    hist.block_until_ready()
    dt = time.monotonic() - t0
    total_hist = int(jnp.sum(hist.astype(jnp.uint64)))
    total_mass = int(jnp.sum(mass.astype(jnp.uint64)))
    ok = total_hist == total_mass and total_mass > 0
    print(
        f"scatter k=2^{k_log2}: {dt:.2f}s first-call, hist_sum="
        f"{total_hist} mass_sum={total_mass} "
        f"{'OK' if ok else 'MASS MISMATCH'}",
        flush=True,
    )
    return 0 if ok else 1


def leg_render(cap_log2: int, rows: int) -> int:
    """Full tiny MH render with --replay-capacity forced to 2^cap_log2.
    Checks that deposited mass is nonzero and drops are zero."""
    import os

    stats = f"/tmp/mh_cap_render_{cap_log2}_{rows}.json"
    cmd = [
        sys.executable, "-m", "cudabrot_tpu.cli",
        "--sampler", "mh",
        "--center", "-0.743643887,0.131825904", "--span", "6e-3",
        "--sample-domain",
        "-0.943643887,-0.543643887,0.031825904,0.231825904",
        "-w", "400", "-h", "400", "-m", "3000", "-c", "100",
        "-t", "25", "--lane-rows", str(rows),
        "--replay-capacity", str(1 << cap_log2),
        "--stats-json", stats, "-o", "/tmp/mh_cap_render.pgm",
    ]
    rc = subprocess.call(
        cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
    )
    if rc != 0:
        print(f"render cap=2^{cap_log2} rows={rows}: cli rc={rc}",
              flush=True)
        return 1
    if not os.path.exists(stats):
        print(f"render cap=2^{cap_log2} rows={rows}: no stats json",
              flush=True)
        return 1
    st = json.load(open(stats))
    dep = int(st.get("on_canvas_points", 0))
    drops = int(st.get("replay_dropped", 0))
    lost = st.get("mh_lost_weight", 0)
    passes = st.get("passes", 0)
    ok = dep > 0 and passes > 0
    print(
        f"render cap=2^{cap_log2} rows={rows}: deposited={dep} "
        f"drops={drops} lost_weight={lost} passes={passes} "
        f"{'OK' if ok else 'COLLAPSED'}",
        flush=True,
    )
    return 0 if ok else 1


LEGS = {
    "gather": lambda a: leg_gather(int(a[0])),
    "scatter": lambda a: leg_scatter(int(a[0])),
    "render": lambda a: leg_render(int(a[0]), int(a[1])),
}


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        return LEGS[sys.argv[2]](sys.argv[3:])

    # Orchestrated batch: ascending risk, stop at first hang.
    batch = [
        ("gather", ["19"], 420),
        ("gather", ["20"], 420),
        ("gather", ["21"], 420),
        ("scatter", ["19"], 420),
        ("scatter", ["20"], 420),
        ("scatter", ["21"], 420),
        # Full renders: control (2^19, known good), then the anomaly
        # region. rows=128 is the kernel-sweep collapse shape.
        ("render", ["19", "64"], 420),
        ("render", ["20", "64"], 420),
        ("render", ["20", "128"], 420),
        ("render", ["21", "64"], 480),
    ]
    for name, args, tmo in batch:
        _logline(f"START leg {name} {args} (timeout {tmo}s)")
        t0 = time.monotonic()
        try:
            rc = subprocess.call(
                [sys.executable, __file__, "--leg", name, *args],
                timeout=tmo,
            )
        except subprocess.TimeoutExpired:
            _logline(f"HANG leg {name} {args} after {tmo}s — "
                     "stopping batch (device may be wedged)")
            return 2
        _logline(f"DONE leg {name} {args} rc={rc} "
                 f"({time.monotonic() - t0:.0f}s)")
        if rc != 0:
            _logline(f"FAIL leg {name} {args} — continuing "
                     "(failures are data; hangs stop the batch)")
    _logline("batch complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
