"""Probe: hand-written Pallas histogram scatter-accumulate on TPU.

The XLA scatter wall (benchmarks/PERF_NOTES.md "The scatter wall"):
~1.0-1.5e8 ids/s for `hist.at[ids].add(1)`, which caps the device replay
path at ~5.6e7 pts/s end-to-end. The reference increments its histogram
in-kernel on the accelerator (cudabrot.cu:302-314); this probe measures
whether a hand-written Mosaic kernel beats XLA's serialized scatter for
VMEM-resident histograms.

Design under test (ops/binning.scatter_pallas): histogram lives whole in
VMEM as (rows, 128) i32; ids stream through SMEM in grid-pipelined
blocks (Mosaic only allows scalar loads from SMEM — a dynamic lane index
into VMEM is rejected: "cannot statically prove that index in dimension
1 is a multiple of 128"); each id deposits via a dynamic-row
read-modify-write with a lane one-hot add:

    hist[b >> 7, :] += (iota128 == (b & 127))

Variants swept here:
  control    — same loop, RMW always on row 0 (loop+scalar-load floor)
  slots{S}   — S interleaved ids per loop iteration into S private
               histogram copies (provably-disjoint RMW chains for the
               scheduler to pipeline; dense-merged at the end)
  chunk{C}   — SMEM block size (DMA granularity / pipeline depth)
  xla        — the XLA scatter-add baseline

Run: python benchmarks/pallas_scatter_probe.py [P_log2] [B] [--interpret]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

i32 = jnp.int32


def timed(fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    interpret = "--interpret" in sys.argv
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from cudabrot_tpu.ops import binning

    p_log2 = int(argv[0]) if len(argv) > 0 else 22
    B = int(argv[1]) if len(argv) > 1 else 1_000_000
    P = 1 << p_log2
    key = jax.random.key(0)
    ids = jax.random.randint(key, (P,), 0, B, dtype=i32)
    ids_half = ids[: P // 2]
    want = np.bincount(np.asarray(ids), minlength=B)
    hist0 = jnp.zeros(B, i32)
    print(f"backend={jax.default_backend()} P={P} B={B} "
          f"interpret={interpret}", flush=True)

    legs = []
    for s, u in ((1, 1), (2, 1), (4, 1), (8, 1),
                 (2, 4), (4, 4), (8, 4), (4, 8)):
        legs.append((
            f"slots{s}/u{u}",
            lambda idv, s=s, u=u: binning.scatter_pallas(
                hist0, idv, slots=s, unroll=u, chunk=2048,
                interpret=interpret),
        ))
    for ch in (4096, 8192):
        legs.append((
            f"slots4/u4/ch{ch}",
            lambda idv, ch=ch: binning.scatter_pallas(
                hist0, idv, slots=4, unroll=4, chunk=ch,
                interpret=interpret),
        ))
    legs.append((
        "control/u4",
        lambda idv: binning.scatter_pallas(
            hist0, idv, slots=1, unroll=4, chunk=2048,
            interpret=interpret, control=True),
    ))

    @jax.jit
    def xla(idv):
        return jnp.zeros(B, i32).at[idv].add(1, mode="drop")

    legs.append(("xla_scatter", xla))

    nrep = 2 if interpret else 5
    for name, fn in legs:
        try:
            out = np.asarray(jax.block_until_ready(fn(ids)))
            ok = "ok" if ("control" in name or (out == want).all()) else "WRONG"
            dt = timed(lambda: fn(ids), n=nrep)
            dt_half = timed(lambda: fn(ids_half), n=nrep)
            slope = (P - P // 2) / max(dt - dt_half, 1e-9)
            print(f"  {name:<16} slope {slope / 1e6:9.1f} M ids/s   "
                  f"(full {dt * 1e3:.2f} ms, half {dt_half * 1e3:.2f} ms)"
                  f"  {ok}", flush=True)
        except Exception as e:  # noqa: BLE001 - probe reports and moves on
            msg = str(e).split("\n")[0][:160]
            print(f"  {name:<16} FAILED: {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
