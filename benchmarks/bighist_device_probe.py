"""Device-side dense accumulation candidates for >VMEM histograms.

The reference deposits orbit points on the accelerator at every canvas
size (IncrementPixelCounter, cudabrot.cu:302-314). Our Mosaic RMW kernel
covers VMEM-resident histograms only (ops/binning.py); at the north-star
20000^2 config (4e8 bins) the device path falls back to XLA scatter-add
(~1.1e8 slots/s, HBM-latency bound) and production replay runs on the
host CPU (VERDICT r4 weak #1/#7). This probe measures the candidate
device-side strategies for big histograms:

  xla        plain hist.at[ids].add(1)           (the current fallback)
  sortadd    sort ids, then scatter-add with indices_are_sorted=True
  sortuniq   sort ids, run-length-collapse to (unique id, count) pairs,
             then scatter-add with indices_are_sorted + unique_indices
             (the scatter never has to handle collisions; duplicates
             collapse into a single dense update each)

Bin ids are row-major (row*width+col), so a full sort IS a partition by
histogram row — the host radix64 accumulator's trick, on-chip.

Hazard protocol (CLAUDE.md): an op doing O(num_bins) work per flush at
3e8 bins previously wedged the device for 30+ minutes. Every candidate
here does O(P log P) work in the ids, never O(num_bins); still, sizes
ramp 1e6 -> 1e7 -> 1e8 -> 4e8 bins and each step prints before it runs
so a wedge is attributable.

Usage:  python benchmarks/bighist_device_probe.py [P_log2] [reps]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cudabrot_tpu.ops import binning
from cudabrot_tpu.utils import jaxcache

jaxcache.enable()


def make_ids(key, p: int, nbins: int, sentinel_frac: float = 0.15):
    """Synthetic orbit-point ids: clustered (Zipf-ish) over the bin
    range with a sentinel fraction, matching the replay stream's mix."""
    k1, k2, k3 = jax.random.split(key, 3)
    # Cluster: half the mass in 1/64 of the bins (buddhabrot density is
    # heavy near the set boundary), half uniform.
    dense = jax.random.randint(k1, (p,), 0, max(nbins // 64, 1))
    wide = jax.random.randint(k2, (p,), 0, nbins)
    pick = jax.random.bernoulli(k3, 0.5, (p,))
    ids = jnp.where(pick, dense, wide).astype(jnp.int32)
    sent = jax.random.bernoulli(k1, sentinel_frac, (p,))
    return jnp.where(sent, nbins, ids)


@jax.jit
def _xla(hist, ids):
    return hist.at[ids].add(
        jnp.ones_like(ids, dtype=hist.dtype), mode="drop"
    )


@jax.jit
def _sortonly(hist, ids):
    # Isolates the sort term of sortadd/sortuniq: fold the sorted ids
    # into the histogram with a single-element touch so the sort cannot
    # be dead-code-eliminated, but no scatter runs.
    s = jax.lax.sort(ids)
    return hist.at[0].add(s[0].astype(hist.dtype) & 1)


@jax.jit
def _sortadd(hist, ids):
    s = jax.lax.sort(ids)
    return hist.at[s].add(
        jnp.ones_like(s, dtype=hist.dtype), mode="drop",
        indices_are_sorted=True,
    )


@jax.jit
def _sortuniq(hist, ids):
    s = jax.lax.sort(ids)
    p = s.shape[0]
    # Run-length collapse: position i holds the FIRST occurrence of its
    # value; count = next first-occurrence position - this one. All
    # vector ops, O(P).
    first = jnp.concatenate(
        [jnp.array([True]), s[1:] != s[:-1]]
    )
    pos = jnp.arange(p, dtype=jnp.int32)
    # next boundary after i: running max of (first ? pos : -1) from the
    # right gives, at each first-occurrence, the NEXT boundary. Use the
    # standard trick: boundary positions, cummax-reversed.
    nxt = jnp.concatenate([jnp.where(first, pos, p + 1)[1:],
                           jnp.array([p], dtype=jnp.int32)])
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt)))
    counts = jnp.where(first, nxt - pos, 0).astype(hist.dtype)
    uids = jnp.where(first, s, hist.shape[0])
    return hist.at[uids].add(
        counts, mode="drop", indices_are_sorted=True, unique_indices=True
    )


@jax.jit
def _bigtiles(hist, ids):
    return binning.scatter_bigtiles(hist, ids)


@jax.jit
def _bigtiles_mxu(hist, ids):
    return binning.scatter_bigtiles(hist, ids, mxu=True)


def bench(fn, name, nbins, ids, reps, check_against=None):
    hist = jnp.zeros((nbins,), jnp.uint32)
    print(f"  {name} @ bins={nbins:.0e}: compiling...", flush=True)
    t0 = time.monotonic()
    out = fn(hist, ids)
    out.block_until_ready()
    compile_t = time.monotonic() - t0
    # Timed: fold reps batches through (donation keeps hist on device).
    t0 = time.monotonic()
    for _ in range(reps):
        out = fn(out, ids)
    out.block_until_ready()
    dt = time.monotonic() - t0
    rate = ids.shape[0] * reps / dt
    ok = ""
    if check_against is not None:
        ok = "BITWISE-EQ" if bool(
            jnp.array_equal(out, check_against)
        ) else "MISMATCH!"
    print(
        f"  {name:9s} bins={nbins:.0e} P={ids.shape[0]:.1e}: "
        f"{rate:.3e} ids/s  ({dt/reps*1e3:.1f} ms/call, "
        f"compile {compile_t:.1f}s) {ok}",
        flush=True,
    )
    return out, rate


def main():
    p_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 23
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    p = 1 << p_log2
    key = jax.random.PRNGKey(7)
    print(f"backend={jax.default_backend()} P=2^{p_log2}={p:.2e} "
          f"reps={reps}", flush=True)
    results = {}
    for nbins in (1 << 20, 1 << 24, 1 << 27, 400_000_000):
        print(f"--- bins={nbins:.2e} "
              f"(hist {nbins*4/1e9:.2f} GB) ---", flush=True)
        ids = make_ids(key, p, nbins)
        ids.block_until_ready()
        ref, r_x = bench(_xla, "xla", nbins, ids, reps)
        _, r_so = bench(_sortonly, "sortonly", nbins, ids, reps)
        _, r_sa = bench(_sortadd, "sortadd", nbins, ids, reps,
                        check_against=None)
        _, r_su = bench(_sortuniq, "sortuniq", nbins, ids, reps,
                        check_against=None)
        _, r_bt = bench(_bigtiles, "bigtiles", nbins, ids, reps,
                        check_against=None)
        _, r_bm = bench(_bigtiles_mxu, "bigtilesM", nbins, ids, reps,
                        check_against=None)
        # Padded-native bigtiles (no per-call pad/unpad copies): the
        # rate the engine sees once it holds the tiled layout.
        _, rows_pad = binning.bigtiles_layout(nbins)
        hp = jnp.zeros((rows_pad * 128,), jnp.uint32)
        btp = jax.jit(functools.partial(
            binning.scatter_bigtiles_padded, nbins=nbins))
        print(f"  bigtilesP @ bins={nbins:.0e}: compiling...", flush=True)
        t0 = time.monotonic()
        hp2 = btp(hp, ids)
        hp2.block_until_ready()
        cmp_t = time.monotonic() - t0
        t0 = time.monotonic()
        for _ in range(reps):
            hp2 = btp(hp2, ids)
        hp2.block_until_ready()
        dt = time.monotonic() - t0
        r_bp = ids.shape[0] * reps / dt
        print(f"  bigtilesP bins={nbins:.0e} P={ids.shape[0]:.1e}: "
              f"{r_bp:.3e} ids/s  ({dt/reps*1e3:.1f} ms/call, "
              f"compile {cmp_t:.1f}s)", flush=True)
        # Correctness: one-call comparison vs xla on a fresh histogram.
        h0 = jnp.zeros((nbins,), jnp.uint32)
        a = _xla(h0, ids)
        b = _sortuniq(jnp.zeros((nbins,), jnp.uint32), ids)
        c = _sortadd(jnp.zeros((nbins,), jnp.uint32), ids)
        d = _bigtiles(jnp.zeros((nbins,), jnp.uint32), ids)
        e = _bigtiles_mxu(jnp.zeros((nbins,), jnp.uint32), ids)
        eq_u = bool(jnp.array_equal(a, b))
        eq_s = bool(jnp.array_equal(a, c))
        eq_b = bool(jnp.array_equal(a, d))
        eq_m = bool(jnp.array_equal(a, e))
        print(f"  correctness: sortuniq=={'OK' if eq_u else 'FAIL'} "
              f"sortadd=={'OK' if eq_s else 'FAIL'} "
              f"bigtiles=={'OK' if eq_b else 'FAIL'} "
              f"bigtilesM=={'OK' if eq_m else 'FAIL'}", flush=True)
        results[nbins] = (r_x, r_so, r_sa, r_su, r_bt, r_bm, r_bp)
    print("\nsummary (ids/s):")
    for nbins, (r_x, r_so, r_sa, r_su, r_bt, r_bm, r_bp) in results.items():
        print(f"  bins={nbins:.0e}: xla {r_x:.2e}  sortonly {r_so:.2e}  "
              f"sortadd {r_sa:.2e}  sortuniq {r_su:.2e}  "
              f"bigtiles {r_bt:.2e}  bigtilesM {r_bm:.2e}  "
              f"bigtilesP {r_bp:.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
