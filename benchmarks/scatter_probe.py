"""Measure candidate histogram-scatter strategies on the real device.

The TPU has no atomic scatter; the orbit-point -> histogram accumulation
strategy decides whether the engine can hit the 1e10 iter/s north star
(SURVEY.md §7 hard parts). This probe times, for a batch of P point-ids
into B bins:

  a) XLA scatter-add, unsorted ids
  b) XLA scatter-add after sorting (indices_are_sorted=True)
  c) sort + run-length-compress + scatter of unique (sorted+unique flags)
  d) sort + searchsorted over all bin boundaries (dense, scatter-free)
  e) one-hot matmul accumulation (dense, MXU) for small bin counts

Run: python benchmarks/scatter_probe.py [P_log2] [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=5):
    jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    p_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    P = 1 << p_log2
    key = jax.random.key(0)
    ids = jax.random.randint(key, (P,), 0, B, dtype=jnp.int32)
    hist = jnp.zeros(B, jnp.uint32)
    print(f"backend={jax.default_backend()} P={P} B={B}")

    @jax.jit
    def xla_unsorted(h, i):
        return h.at[i].add(jnp.uint32(1), mode="drop")

    @jax.jit
    def xla_sorted(h, i):
        s = jnp.sort(i)
        return h.at[s].add(jnp.uint32(1), mode="drop", indices_are_sorted=True)

    @jax.jit
    def sort_unique_scatter(h, i):
        s = jnp.sort(i)
        first = jnp.concatenate(
            [jnp.ones(1, bool), s[1:] != s[:-1]]
        )
        # position of each run start; run length = next_start - start
        starts = jnp.nonzero(first, size=P, fill_value=P)[0]
        run_vals = jnp.where(starts < P, s[jnp.minimum(starts, P - 1)], B)
        next_starts = jnp.concatenate([starts[1:], jnp.array([P])])
        lengths = jnp.where(starts < P, next_starts - starts, 0)
        return h.at[run_vals].add(
            lengths.astype(jnp.uint32),
            mode="drop",
            indices_are_sorted=True,
            unique_indices=True,
        )

    @jax.jit
    def sort_searchsorted(h, i):
        s = jnp.sort(i)
        bounds = jnp.searchsorted(s, jnp.arange(B + 1, dtype=jnp.int32))
        return h + jnp.diff(bounds).astype(jnp.uint32)

    @jax.jit
    def onehot_matmul(h, i):
        # decompose id -> (row_block, col) with col width 1024; accumulate
        # counts as sum of outer one-hots via matmul on the MXU.
        W = 1024
        rows = i // W
        cols = i % W
        nrows = B // W
        ra = jax.nn.one_hot(rows, nrows, dtype=jnp.bfloat16)
        ca = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)
        upd = jnp.dot(ra.T, ca, preferred_element_type=jnp.float32)
        return h + upd.reshape(-1).astype(jnp.uint32)

    results = {}
    for name, fn in [
        ("xla_unsorted", xla_unsorted),
        ("xla_sorted", xla_sorted),
        ("sort_unique_scatter", sort_unique_scatter),
        ("sort_searchsorted", sort_searchsorted),
    ]:
        try:
            dt = timed(fn, hist, ids)
            results[name] = dt
            print(f"{name:22s} {dt*1e3:9.3f} ms  {P/dt/1e9:8.3f} Gpts/s")
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {e}")

    if P <= 1 << 20:  # one-hot memory explodes otherwise
        try:
            dt = timed(onehot_matmul, hist, ids)
            print(f"{'onehot_matmul':22s} {dt*1e3:9.3f} ms  {P/dt/1e9:8.3f} Gpts/s")
        except Exception as e:
            print(f"{'onehot_matmul':22s} FAILED: {type(e).__name__}: {e}")

    # correctness cross-check on small size
    small_ids = np.random.default_rng(0).integers(0, 1000, 4096).astype(np.int32)
    want = np.bincount(small_ids, minlength=1000).astype(np.uint32)
    h0 = jnp.zeros(1000, jnp.uint32)
    si = jnp.asarray(small_ids)
    for name, fn in [("xla_unsorted", xla_unsorted), ("xla_sorted", xla_sorted)]:
        got = np.asarray(fn(h0, si))
        assert np.array_equal(got, want), name
    print("correctness OK")


if __name__ == "__main__":
    main()
