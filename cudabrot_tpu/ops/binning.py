"""Orbit-point -> histogram-bin math and scatter backends.

The reference scatters with a racy, non-atomic `data[row*w+col] += 1` from
262k concurrent threads (IncrementPixelCounter, cudabrot.cu:302-314), losing
colliding updates as accepted Monte-Carlo noise. TPUs have no atomic (or
even fast random-access) scatter, so accumulation here is *deterministic*:
orbit points are quantized to flat bin ids (out-of-canvas points map to a
sentinel) and folded into the histogram with `hist.at[ids].add(1)` (XLA
scatter-add) — statistically equivalent to the reference and bitwise
deterministic (the reference is neither, cudabrot.cu:312).

A scatter-free "sort" backend (sort ids + searchsorted per-bin counts +
dense add) was built, measured, and REMOVED: XLA lowers searchsorted to
serial-rate gathers on TPU, so it lost to plain scatter-add at every
realistic size and its O(num_bins)-per-flush cost faulted the device
outright at production canvases (benchmarks/PERF_NOTES.md "scatter wall";
VERDICT r2 weak #4 adjudicated it dead config surface).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudabrot_tpu.config import Canvas

def points_to_bin_ids_sharded(
    canvas: Canvas, re, im, valid, row_start, row_count: int
):
    """Like points_to_bin_ids, but for a row-sharded histogram: only
    points whose row lands in [row_start, row_start+row_count) produce a
    local id (row - row_start) * width + col; everything else maps to the
    local sentinel row_count*width. ``row_start`` may be traced (e.g.
    derived from a mesh axis index)."""
    dtype = re.dtype
    min_real = jnp.asarray(canvas.min_real, dtype)
    min_imag = jnp.asarray(canvas.min_imag, dtype)
    ok = valid & (re >= min_real) & (im >= min_imag)
    col = ((re - min_real) / jnp.asarray(canvas.delta_real, dtype)).astype(
        jnp.int32
    )
    row = ((im - min_imag) / jnp.asarray(canvas.delta_imag, dtype)).astype(
        jnp.int32
    )
    ok = (
        ok
        & (row >= 0)
        & (row < canvas.height)
        & (col >= 0)
        & (col < canvas.width)
    )
    local_row = row - row_start
    ok = ok & (local_row >= 0) & (local_row < row_count)
    flat = local_row * canvas.width + col
    return jnp.where(ok, flat, row_count * canvas.width)


def points_to_bin_ids(canvas: Canvas, re, im, valid):
    """Quantize complex orbit points to flat histogram bin ids.

    Mirrors IncrementPixelCounter (cudabrot.cu:302-314): points below the
    canvas minimum on either axis are rejected *before* the divide (guarding
    the truncation-toward-zero artifact the reference comments on at
    cudabrot.cu:305-308), then col/row are computed by truncating division
    and bounds-checked. Invalid/out-of-canvas points get the sentinel id
    ``canvas.num_pixels``.
    """
    dtype = re.dtype
    min_real = jnp.asarray(canvas.min_real, dtype)
    min_imag = jnp.asarray(canvas.min_imag, dtype)
    ok = valid & (re >= min_real) & (im >= min_imag)
    # Guarded non-negative, so int-cast truncation == floor (matches the C
    # int cast at cudabrot.cu:309-310).
    col = ((re - min_real) / jnp.asarray(canvas.delta_real, dtype)).astype(
        jnp.int32
    )
    row = ((im - min_imag) / jnp.asarray(canvas.delta_imag, dtype)).astype(
        jnp.int32
    )
    ok = ok & (row >= 0) & (row < canvas.height) & (col >= 0) & (col < canvas.width)
    flat = row * canvas.width + col
    return jnp.where(ok, flat, canvas.num_pixels)


def points_to_bin_ids_df(canvas: Canvas, reh, rel, imh, iml, valid, mr, mi):
    """Extended-precision variant of points_to_bin_ids for df32 orbit
    points: the offset from the canvas minimum is computed in df32 (hi
    accurate to ~2^-48 absolute), then quantized in f32 — the offset's
    magnitude is at most the canvas span, so f32's 2^-24 relative
    resolution stays sub-pixel for canvases up to 2^24 px on a side.

    ``mr``/``mi`` are (hi, lo) RUNTIME scalars of canvas.min_real /
    min_imag — passing them as compile-time literals would let the
    compiler fold the df32 subtraction chain in excess precision
    (ops/df32.py module docstring). Multiplies by the inverse pitch
    (like the native AVX path) rather than dividing; the difference is
    sub-statistical at bin edges.
    """
    from cudabrot_tpu.ops import df32

    dxh, _ = df32.add(reh, rel, -mr[0], -mr[1])
    dyh, _ = df32.add(imh, iml, -mi[0], -mi[1])
    inv_dr = jnp.float32(1.0 / canvas.delta_real)
    inv_di = jnp.float32(1.0 / canvas.delta_imag)
    # Low-bound guard before truncation (cudabrot.cu:305-308 semantics).
    ok = valid & (dxh >= 0.0) & (dyh >= 0.0)
    col = (dxh * inv_dr).astype(jnp.int32)
    row = (dyh * inv_di).astype(jnp.int32)
    ok = (
        ok
        & (row >= 0)
        & (row < canvas.height)
        & (col >= 0)
        & (col < canvas.width)
    )
    flat = row * canvas.width + col
    return jnp.where(ok, flat, canvas.num_pixels)


def points_to_bin_ids_df_sharded(
    canvas: Canvas, reh, rel, imh, iml, valid, mr, mi, row_start,
    row_count: int,
):
    """Row-sharded variant of points_to_bin_ids_df: the df32 offset
    quantization of the global helper with points_to_bin_ids_sharded's
    local-row windowing (sentinel = row_count * width). ``row_start``
    may be traced (a mesh axis index)."""
    from cudabrot_tpu.ops import df32

    dxh, _ = df32.add(reh, rel, -mr[0], -mr[1])
    dyh, _ = df32.add(imh, iml, -mi[0], -mi[1])
    inv_dr = jnp.float32(1.0 / canvas.delta_real)
    inv_di = jnp.float32(1.0 / canvas.delta_imag)
    ok = valid & (dxh >= 0.0) & (dyh >= 0.0)
    col = (dxh * inv_dr).astype(jnp.int32)
    row = (dyh * inv_di).astype(jnp.int32)
    ok = (
        ok
        & (row >= 0)
        & (row < canvas.height)
        & (col >= 0)
        & (col < canvas.width)
    )
    local_row = row - row_start
    ok = ok & (local_row >= 0) & (local_row < row_count)
    flat = local_row * canvas.width + col
    return jnp.where(ok, flat, row_count * canvas.width)


def _pallas_scatter_kernel(*refs,
                           chunk: int, slots: int, nsteps: int,
                           unroll: int = 1, control: bool = False,
                           use_skip: bool = False):
    """Sequential dynamic-row RMW deposit into a VMEM-resident histogram.

    The reference increments its histogram in-kernel on the accelerator
    (IncrementPixelCounter, cudabrot.cu:302-314, racy atomics-free adds);
    XLA's scatter emulation of that runs at ~1.0-1.5e8 ids/s on TPU (the
    "scatter wall", benchmarks/PERF_NOTES.md). This kernel does the same
    deposit as a hand-scheduled Mosaic loop: a point's bin maps to
    (row, lane) = (b >> 7, b & 127) of the (rows, 128) histogram layout,
    and the deposit is a dynamic-row read-modify-write with a lane
    one-hot add.

    Ids stream through SMEM in grid-pipelined ``chunk``-sized blocks:
    Mosaic only allows *scalar* loads from SMEM (a dynamic lane index
    into VMEM fails to compile), and the sequential TPU grid overlaps
    each block's DMA with the previous block's deposit loop. ``slots``
    > 1 interleaves that loop over private histogram copies (slot 0 is
    the aliased output itself), giving the scheduler provably-disjoint
    RMW chains to pipeline; the copies dense-merge in VMEM on the last
    grid step.

    Sentinel ids (== padded-layout positions >= num_bins) land in pad
    cells that the caller never reads back, so the loop is branch-free.
    ``control`` (probe only) pins the RMW to row 0, measuring the
    loop+scalar-load floor.

    The histogram is a pure output (counts for THIS batch of ids; the
    caller dense-adds it to the running histogram): an aliased
    input-output was measured CORRUPTED on silicon — with a constant
    block index the pipelined input refetch races the accumulating
    output block across grid steps (probe r4: slots1 "WRONG").

    ``use_skip`` (r5): a scalar-prefetch i32 flag per grid step (1 =
    every id in the chunk is a sentinel) gates the whole deposit loop.
    The device replay's id stream is step-major over length-sorted
    orbit blocks, so the chunk-tail slots past a block's longest orbit
    arrive as *contiguous all-sentinel chunks*: at the default band
    (~40-step orbits padded to 128-step chunks) ~69% of slots are
    sentinel and the skip turns them from deposit-loop work (the
    scatter wall) into a skipped grid step (DMA only).
    """
    if use_skip:
        skip_ref, _cidx_ref, ids_ref, hist_ref, *slot_sc = refs
    else:
        ids_ref, hist_ref, *slot_sc = refs
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _zero():
        hist_ref[...] = jnp.zeros_like(hist_ref)
        for sc in slot_sc:
            sc[...] = jnp.zeros_like(sc)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    per = chunk // slots

    # Mosaic's fori_loop lowering only supports full or no unroll, so
    # the unroll is manual: each trip deposits ``unroll`` consecutive
    # ids per slot (requires chunk % (slots * unroll) == 0, enforced by
    # the caller).
    def body(k0, _):
        for uu in range(unroll):
            k = k0 * unroll + uu
            for s in range(slots):
                b = ids_ref[s * per + k]
                row = jax.lax.shift_right_logical(b, jnp.int32(7))
                lane = jnp.bitwise_and(b, jnp.int32(127))
                if control:
                    # Keep the row traced (a concrete 0 trips pl.ds's
                    # pytree handling on the TPU lowering path).
                    row = jnp.bitwise_and(b, jnp.int32(0))
                oh = (iota == lane).astype(jnp.int32)
                tgt = hist_ref if s == 0 else slot_sc[s - 1]
                cur = tgt[pl.ds(row, 1), :]
                tgt[pl.ds(row, 1), :] = cur + oh
        return 0

    def _deposit():
        jax.lax.fori_loop(0, per // unroll, body, 0)

    if use_skip:
        pl.when(skip_ref[step] == 0)(_deposit)
    else:
        _deposit()

    if slot_sc:
        @pl.when(step == nsteps - 1)
        def _merge_slots():
            for sc in slot_sc:
                hist_ref[...] = hist_ref[...] + sc[...]


@functools.partial(
    jax.jit,
    static_argnames=("rows_pad", "slots", "chunk", "unroll", "interpret",
                     "control"),
)
def _pallas_scatter_call(ids, rows_pad: int, slots: int, chunk: int,
                         unroll: int, interpret: bool, control: bool,
                         skip=None):
    """Count ids into a zeroed (rows_pad, 128) i32 layout (this batch
    only — the caller adds the result to its running histogram).

    ``skip``: optional (nsteps,) i32 scalar-prefetch flags; chunks
    flagged 1 skip the deposit loop entirely (see the kernel docstring).
    """
    n = ids.shape[0]
    nsteps = n // chunk
    use_skip = skip is not None
    kern = functools.partial(
        _pallas_scatter_kernel, chunk=chunk, slots=slots, nsteps=nsteps,
        unroll=unroll, control=control, use_skip=use_skip,
    )
    # The default 16 MB scoped-vmem budget rejects multi-slot copies
    # of production histograms; size the limit to the actual buffers
    # (+25% Mosaic overhead margin), capped under the v5e's 128 MB.
    params = pltpu.CompilerParams(
        vmem_limit_bytes=min(
            int((slots * rows_pad * 512 + 4 * chunk) * 1.25)
            + (1 << 20),
            112 * 1024 * 1024,
        ),
    )
    out_shape = jax.ShapeDtypeStruct((rows_pad, 128), jnp.int32)
    scratch = [pltpu.VMEM((rows_pad, 128), jnp.int32)] * (slots - 1)
    if use_skip:
        # Chunk index map: skipped (all-sentinel) chunks REPEAT the last
        # real chunk's index, so the revisiting pipeline never re-fetches
        # them — without this the grid is DMA-bound on the sentinel
        # padding (measured: capacity 2^20 batched replay lost ~40% of
        # its throughput to HBM->SMEM streaming of chunks whose deposit
        # loop was already skipped). Leading skipped chunks clamp to 0
        # (any index works; the deposit is gated off).
        iota = jnp.arange(skip.shape[0], dtype=jnp.int32)
        cidx = jax.lax.cummax(jnp.where(skip == 0, iota, -1))
        cidx = jnp.maximum(cidx, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i, skip, cidx: (cidx[i],),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (rows_pad, 128), lambda i, skip, cidx: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(skip, cidx, ids)
    return pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows_pad, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(ids)


#: Conservative VMEM budget for the pallas scatter backend: histogram
#: copies (slots * bytes) + id staging must fit comfortably under the
#: v5e's 128 MB VMEM alongside Mosaic's own overheads.
PALLAS_SCATTER_VMEM_BUDGET = 80 * 1024 * 1024
#: Private-histogram copies (measured sweet spot on v5e: 380 M ids/s at
#: slots8/unroll8/chunk8192 vs 132 M for XLA scatter-add, P=32M ids into
#: 1M bins; see benchmarks/pallas_scatter_probe.py + PERF_NOTES.md).
PALLAS_SCATTER_SLOTS = 8
#: fori_loop body unroll inside the deposit loop (loop-carried scalar
#: overhead amortization; measured in benchmarks/pallas_scatter_probe.py).
PALLAS_SCATTER_UNROLL = 8
#: Whether "auto" may pick the Mosaic kernel on TPU: measured 2.9x XLA
#: per-call (380 vs 132.6 M ids/s at P=32M, B=1M; ~4.4x net of the ~30 ms
#: tunnel dispatch) with bitwise-equal output, 2026-08-19 probe.
PALLAS_SCATTER_AUTO = True
#: Whether "auto" may pick the sorted backend for >VMEM histograms on
#: TPU (flip after benchmarks/bighist_device_probe.py measures it
#: faster than plain scatter-add at production bin counts).
SORTED_SCATTER_AUTO = False


def pallas_scatter_rows(nbins: int) -> int:
    """Padded (rows, 128) layout height for an nbins histogram: covers
    the sentinel id == nbins in a pad cell the caller never reads."""
    return nbins // 128 + 1


def scatter_pallas(hist_flat, ids, *, slots: int = 0, chunk: int = 8192,
                   unroll: int = 0, interpret=False, control=False,
                   skip_chunks: bool = False):
    """Scatter-add ones at ``ids`` via the Mosaic RMW kernel.

    Bitwise-identical results to scatter_xla (both are exact integer
    adds; the deposit order differs but addition commutes). ``ids`` may
    be any shape; sentinel == hist_flat.shape[0] is dropped. The caller
    is responsible for the VMEM-residency check (select_scatter_backend).

    ``skip_chunks``: precompute a per-chunk all-sentinel flag (one
    vector min-reduce over the id stream) and skip flagged chunks'
    deposit loops inside the kernel. Pays when the stream carries
    contiguous sentinel runs — the device replay's step-major layout
    over length-sorted orbit blocks (chunk-tail padding); costs one
    extra read of the ids when it doesn't.
    """
    nbins = hist_flat.shape[0]
    rows_pad = pallas_scatter_rows(nbins)
    if slots <= 0:
        slots = PALLAS_SCATTER_SLOTS
        while slots > 1 and slots * rows_pad * 512 > PALLAS_SCATTER_VMEM_BUDGET:
            slots //= 2
    flat_ids = ids.reshape(-1).astype(jnp.int32)
    n = flat_ids.shape[0]
    chunk = max(chunk, 128 * slots)
    npad = -n % chunk
    if npad:
        flat_ids = jnp.concatenate(
            [flat_ids, jnp.full((npad,), nbins, jnp.int32)]
        )
    if unroll <= 0:
        unroll = PALLAS_SCATTER_UNROLL
    skip = None
    if skip_chunks:
        skip = (
            jnp.min(flat_ids.reshape(-1, chunk), axis=1) >= nbins
        ).astype(jnp.int32)
    out = _pallas_scatter_call(
        flat_ids, rows_pad, slots, chunk, unroll, interpret, control,
        skip=skip,
    )
    return hist_flat + out.reshape(-1)[:nbins].view(hist_flat.dtype)


def scatter_xla(hist_flat, ids):
    """Scatter-add ones at ``ids`` (sentinel ids dropped by 'drop' mode)."""
    ones = jnp.ones(ids.shape, dtype=hist_flat.dtype)
    return hist_flat.at[ids.reshape(-1)].add(
        ones.reshape(-1), mode="drop", indices_are_sorted=False,
        unique_indices=False,
    )


def scatter_sorted(hist_flat, ids):
    """Scatter-add ones at ``ids`` after sorting and run-length collapse.

    For >VMEM histograms (where the Mosaic RMW kernel cannot hold the
    histogram) the XLA scatter-add is HBM-latency bound on random ids
    (~1.1e8 slots/s). Sorting makes the update stream sequential in
    memory and collapsing duplicate ids to (unique id, count) pairs lets
    the scatter assert ``indices_are_sorted``. Work is O(P log P) in the
    batch, never O(num_bins), respecting the device-fault hazard that
    killed the old searchsorted "sort" backend (module docstring).

    MEASURED DEAD on v5e (benchmarks/bighist_device_probe.py,
    2026-08-20): XLA's TPU scatter emitter does not exploit sortedness —
    9.9e7 ids/s vs 9.4e7 plain at 1.7e7..4e8 bins (the sort itself runs
    at 4.5e8 ids/s). Kept only as an explicit --scatter option for A/B;
    "auto" never selects it (SORTED_SCATTER_AUTO). The real >VMEM
    device-accumulation path is the tiled Mosaic kernel (scatter_bigtiles).

    Duplicate positions keep their sorted id with a zero count (the
    probe's first variant replaced them with the sentinel, which
    interleaved out-of-order ids while asserting indices_are_sorted +
    unique_indices — silicon MISCOMPILED it at >2^24 bins). Bitwise-
    identical to scatter_xla (exact integer adds; addition commutes).
    Sentinel ids sort to the end and drop via mode="drop".
    """
    s = jax.lax.sort(ids.reshape(-1).astype(jnp.int32))
    p = s.shape[0]
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    pos = jnp.arange(p, dtype=jnp.int32)
    # Run-length collapse: at each first occurrence, count = distance to
    # the next first occurrence (reverse cummin of boundary positions).
    nxt = jnp.concatenate(
        [jnp.where(first, pos, p + 1)[1:], jnp.array([p], jnp.int32)]
    )
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt)))
    counts = jnp.where(first, nxt - pos, 0).astype(hist_flat.dtype)
    return hist_flat.at[s].add(
        counts, mode="drop", indices_are_sorted=True, unique_indices=False
    )


# ----------------------------------------------------------------------
# Tiled Mosaic scatter for >VMEM histograms ("bigtiles").
#
# The reference deposits on the accelerator at every canvas size
# (IncrementPixelCounter, cudabrot.cu:302-314). The Mosaic RMW kernel
# above needs the whole histogram in VMEM; beyond that the XLA
# scatter-add is HBM-latency bound (~9e7 ids/s at 1.7e7..4e8 bins,
# benchmarks/bighist_device_probe.py) and sortedness hints do nothing.
# But the sort itself runs at 4.5e8 ids/s — and sorted ids ARE a
# partition of the histogram into row-bands (the host radix64
# accumulator's trick). So: sort, then stream chunks of sorted ids
# through the RMW kernel with the histogram TILE each chunk starts in
# selected per grid step via scalar prefetch. Tile indices are
# non-decreasing, so Pallas's revisiting pipeline fetches and writes
# each touched tile exactly once per pass; untouched tiles never move
# (the histogram is input-output aliased, accumulated in place).
#
# A chunk can straddle a tile boundary: pass A deposits each chunk's
# ids that land in its FIRST id's tile, pass B (same kernel, windows
# from each chunk's LAST id's tile, whole-chunk-gated on
# last != first) catches the stragglers. Ids in tiles strictly between
# the two (a single chunk spanning >1 full tile of id-range — sparse
# corners only) are counted and folded with a lax.cond XLA scatter
# that executes only when nonzero. Work is O(P log P); nothing
# bin-shaped is ever materialized beyond the tile streaming itself
# (the device-fault hazard in the module docstring).
# ----------------------------------------------------------------------

#: (BIGTILES_TILE_ROWS, 128) i32 tile = 4 MB VMEM; power of two so the
#: tile-of-id map is a shift.
BIGTILES_TILE_ROWS = 8192
#: Private tile copies (disjoint RMW chains, ids interleaved round-robin
#: so sorted same-row runs spread across copies).
BIGTILES_SLOTS = 4
BIGTILES_UNROLL = 8
BIGTILES_CHUNK = 8192
#: Whether "auto" may pick bigtiles for >VMEM histograms on TPU (flip
#: after benchmarks/bighist_device_probe.py measures it on silicon).
BIGTILES_AUTO = False


def bigtiles_layout(nbins: int, tile_rows: int = 0) -> tuple[int, int]:
    """(ntiles, padded_rows) covering nbins bins + the sentinel cell."""
    if tile_rows <= 0:
        tile_rows = BIGTILES_TILE_ROWS
    rows = (nbins + 1 + 127) // 128
    ntiles = (rows + tile_rows - 1) // tile_rows
    return ntiles, ntiles * tile_rows


#: MXU deposit-path geometry: per 128-id sorted group, deposits land in
#: up to BIGTILES_MXU_WINDOWS dense windows of BIGTILES_MXU_W rows each
#: (one (W,128ids)x(128lanes,128ids) one-hot contraction per window —
#: duplicates sum exactly; counts <= 128 are f32-exact). Sorted rows
#: make each window a PREFIX of the group's remaining ids, so after NW
#: windows the leftover is a suffix handled by a scalar SMEM fallback
#: (rare: only groups spanning > NW*W rows of the tile).
BIGTILES_MXU_W = 64
BIGTILES_MXU_WINDOWS = 4


def _bigtiles_mxu_kernel(t_own_ref, t_other_ref, ids_smem_ref,
                         idsv_ref, hist_in_ref, hist_out_ref,
                         *, chunk: int, tile_rows: int, nsteps: int,
                         second_pass: bool):
    """MXU variant of the tiled deposit: vectorized one-hot matmul
    deposits instead of the per-id scalar RMW loop."""
    j = pl.program_id(0)
    town = t_own_ref[j]
    prev_t = t_own_ref[jnp.maximum(j - 1, 0)]
    first = jnp.logical_or(j == 0, prev_t != town)

    @pl.when(first)
    def _init_tile():
        hist_out_ref[...] = hist_in_ref[...]

    run = (t_other_ref[j] != town) if second_pass else (town >= 0)

    @pl.when(run)
    def _deposit():
        w = BIGTILES_MXU_W
        nw = BIGTILES_MXU_WINDOWS
        base = town * jnp.int32(tile_rows)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (w, 128), 0)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        big = jnp.int32(0x3FFFFFFF)

        def group(g, _):
            idv = idsv_ref[pl.ds(g, 1), :]  # (1,128) i32, sorted
            rows = jax.lax.shift_right_logical(
                idv, jnp.int32(7)
            ) - base
            lanes = jnp.bitwise_and(idv, jnp.int32(127))
            in_tile = jnp.logical_and(rows >= 0, rows < tile_rows)
            rows_t = jnp.where(in_tile, rows, big)
            # B: (128 lanes, 128 ids) one-hot of each id's lane, masked
            # to in-tile ids. f32 cast feeds the MXU.
            bm = jnp.logical_and(iota_l == lanes, in_tile).astype(
                jnp.float32
            )

            def window(kw, prev_end):
                rem = jnp.where(rows_t >= prev_end, rows_t, big)
                rmin = jnp.min(rem)
                has = rmin < big
                r0 = jnp.clip(rmin, 0, tile_rows - w)

                @pl.when(has)
                def _win_deposit():
                    # rem (not rows_t): the end-of-tile clip can slide
                    # this window back over the previous one — rows
                    # already deposited are masked to `big` in rem, so
                    # the overlap cannot double-deposit.
                    am = (iota_w == (rem - r0)).astype(jnp.float32)
                    d = jax.lax.dot_general(
                        am, bm, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    cur = hist_out_ref[pl.ds(r0, w), :]
                    hist_out_ref[pl.ds(r0, w), :] = (
                        cur + d.astype(jnp.int32)
                    )

                return jnp.where(has, r0 + w, prev_end)

            prev_end = jax.lax.fori_loop(
                0, nw, window, jnp.int32(0)
            )

            # Scalar fallback for ids beyond the NW windows (a suffix of
            # the sorted group — only groups spanning > NW*W rows).
            leftover = jnp.max(jnp.where(in_tile, rows, -1)) >= prev_end

            @pl.when(leftover)
            def _fallback():
                iota1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

                def scal(i, _):
                    b = ids_smem_ref[g * 128 + i]
                    row = jax.lax.shift_right_logical(
                        b, jnp.int32(7)
                    ) - base
                    ok = jnp.logical_and(row >= prev_end, row < tile_rows)
                    rowc = jnp.clip(row, 0, tile_rows - 1)
                    oh = jnp.logical_and(
                        iota1 == jnp.bitwise_and(b, jnp.int32(127)), ok
                    ).astype(jnp.int32)
                    cur = hist_out_ref[pl.ds(rowc, 1), :]
                    hist_out_ref[pl.ds(rowc, 1), :] = cur + oh
                    return 0

                jax.lax.fori_loop(0, 128, scal, 0)

            return 0

        jax.lax.fori_loop(0, chunk // 128, group, 0)


def _bigtiles_kernel(t_own_ref, t_other_ref, ids_ref, hist_in_ref,
                     hist_out_ref, *slot_sc,
                     chunk: int, slots: int, unroll: int, tile_rows: int,
                     nsteps: int, second_pass: bool):
    j = pl.program_id(0)
    town = t_own_ref[j]
    prev_t = t_own_ref[jnp.maximum(j - 1, 0)]
    next_t = t_own_ref[jnp.minimum(j + 1, nsteps - 1)]
    first = jnp.logical_or(j == 0, prev_t != town)
    last = jnp.logical_or(j == nsteps - 1, next_t != town)

    @pl.when(first)
    def _init_tile():
        # Copy-through: the out block is write-only VMEM; seed it from
        # the aliased input tile so in-place accumulation survives the
        # writeback that happens whether or not this chunk deposits.
        hist_out_ref[...] = hist_in_ref[...]
        for sc in slot_sc:
            sc[...] = jnp.zeros_like(sc)

    # Pass B only deposits for chunks that actually straddle a boundary
    # (one scalar branch per grid step, not per id).
    run = (t_other_ref[j] != town) if second_pass else (town >= 0)

    @pl.when(run)
    def _deposit():
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        base = town * jnp.int32(tile_rows)

        def body(k0, _):
            for uu in range(unroll):
                for s in range(slots):
                    # Round-robin slot assignment: sorted neighbors (the
                    # likeliest same-row collisions) land in different
                    # private copies.
                    k = (k0 * unroll + uu) * slots + s
                    b = ids_ref[k]
                    row = jax.lax.shift_right_logical(
                        b, jnp.int32(7)
                    ) - base
                    ok = jnp.logical_and(row >= 0, row < tile_rows)
                    # Branch-free masked RMW: out-of-window ids add a
                    # zero vector at a clamped row.
                    rowc = jnp.clip(row, 0, tile_rows - 1)
                    lane = jnp.bitwise_and(b, jnp.int32(127))
                    oh = jnp.logical_and(iota == lane, ok).astype(
                        jnp.int32
                    )
                    tgt = hist_out_ref if s == 0 else slot_sc[s - 1]
                    cur = tgt[pl.ds(rowc, 1), :]
                    tgt[pl.ds(rowc, 1), :] = cur + oh
            return 0

        jax.lax.fori_loop(0, chunk // (slots * unroll), body, 0)

    if slot_sc:
        @pl.when(last)
        def _merge_slots():
            for sc in slot_sc:
                hist_out_ref[...] = hist_out_ref[...] + sc[...]


@functools.partial(
    jax.jit,
    static_argnames=("tile_rows", "slots", "chunk", "unroll",
                     "second_pass", "interpret", "mxu"),
)
def _bigtiles_pass(t_own, t_other, ids, hist2d, tile_rows: int,
                   slots: int, chunk: int, unroll: int,
                   second_pass: bool, interpret: bool,
                   mxu: bool = False):
    nsteps = ids.shape[0] // chunk
    ntiles = hist2d.shape[0] // tile_rows
    tile_map = lambda j, t_own, t_other: (  # noqa: E731
        jnp.minimum(t_own[j], ntiles - 1), 0
    )
    smem_ids_spec = pl.BlockSpec(
        (chunk,), lambda j, t_own, t_other: (j,),
        memory_space=pltpu.SMEM,
    )
    tile_spec = pl.BlockSpec(
        (tile_rows, 128), tile_map, memory_space=pltpu.VMEM
    )
    if mxu:
        kern = functools.partial(
            _bigtiles_mxu_kernel, chunk=chunk, tile_rows=tile_rows,
            nsteps=nsteps, second_pass=second_pass,
        )
        # ids ride twice: (chunk/128, 128) VMEM vectors for the one-hot
        # contractions plus the flat SMEM copy for the scalar fallback.
        in_specs = [
            smem_ids_spec,
            pl.BlockSpec(
                (chunk // 128, 128), lambda j, t_own, t_other: (j, 0),
                memory_space=pltpu.VMEM,
            ),
            tile_spec,
        ]
        operands = (t_own, t_other, ids, ids.reshape(-1, 128), hist2d)
        alias = {4: 0}
        scratch = []
    else:
        kern = functools.partial(
            _bigtiles_kernel, chunk=chunk, slots=slots, unroll=unroll,
            tile_rows=tile_rows, nsteps=nsteps, second_pass=second_pass,
        )
        in_specs = [smem_ids_spec, tile_spec]
        operands = (t_own, t_other, ids, hist2d)
        alias = {3: 0}
        scratch = [pltpu.VMEM((tile_rows, 128), jnp.int32)] * (slots - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=tile_spec,
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(hist2d.shape, jnp.int32),
        # The histogram is input-output aliased so untouched tiles keep
        # their values and touched tiles accumulate in place.
        input_output_aliases=alias,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int((slots + 4) * tile_rows * 512 * 1.25) + (1 << 20),
                112 * 1024 * 1024,
            ),
        ),
        interpret=interpret,
    )(*operands)


def scatter_bigtiles_padded(hist_pad, ids, nbins: int, *,
                            tile_rows: int = 0, chunk: int = 0,
                            slots: int = 0, unroll: int = 0,
                            mxu: bool = False,
                            interpret: bool = False):
    """Scatter-add ones at ``ids`` into a PADDED tiled histogram.

    ``hist_pad``: (padded_rows * 128,) flat histogram in the
    bigtiles_layout(nbins) padding (cells >= nbins are pad the caller
    never reads; the sentinel id == nbins lands there). Returns the
    updated padded histogram. Bitwise-identical to scatter_xla on the
    first nbins cells (exact integer adds; addition commutes).
    """
    if tile_rows <= 0:
        tile_rows = BIGTILES_TILE_ROWS
    if chunk <= 0:
        chunk = BIGTILES_CHUNK
    if slots <= 0:
        slots = BIGTILES_SLOTS
    if unroll <= 0:
        unroll = BIGTILES_UNROLL
    if tile_rows & (tile_rows - 1):
        raise ValueError("tile_rows must be a power of two")
    if chunk % (slots * unroll):
        raise ValueError("chunk must be a multiple of slots*unroll")
    tile_bins_log2 = (tile_rows * 128).bit_length() - 1

    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    npad = -n % chunk
    if npad:
        flat = jnp.concatenate(
            [flat, jnp.full((npad,), nbins, jnp.int32)]
        )
    s = jax.lax.sort(flat)
    tiles = jax.lax.shift_right_logical(s, jnp.int32(tile_bins_log2))
    tm = tiles.reshape(-1, chunk)
    t1 = tm[:, 0]
    t2 = tm[:, -1]

    hist2d = hist_pad.reshape(-1, 128).view(jnp.int32)
    hist2d = _bigtiles_pass(t1, t2, s, hist2d, tile_rows, slots, chunk,
                            unroll, False, interpret, mxu=mxu)
    hist2d = _bigtiles_pass(t2, t1, s, hist2d, tile_rows, slots, chunk,
                            unroll, True, interpret, mxu=mxu)

    # Middle-tile residue: ids in tiles strictly between a chunk's first
    # and last tile (a single chunk spanning more than a full tile of
    # id-range). Zero in practice; the cond keeps the full-size XLA
    # scatter off the hot path while preserving exactness.
    resid = jnp.logical_and(tm != t1[:, None], tm != t2[:, None])
    nres = jnp.sum(resid)

    def _fold_resid(h):
        pad_bins = h.shape[0] * h.shape[1]
        rid = jnp.where(resid.reshape(-1), s, jnp.int32(pad_bins))
        return (
            h.reshape(-1)
            .at[rid]
            .add(jnp.ones_like(rid), mode="drop")
            .reshape(h.shape)
        )

    hist2d = jax.lax.cond(nres > 0, _fold_resid, lambda h: h, hist2d)
    return hist2d.view(hist_pad.dtype).reshape(hist_pad.shape)


def scatter_bigtiles(hist_flat, ids, *, tile_rows: int = 0,
                     chunk: int = 0, slots: int = 0, unroll: int = 0,
                     mxu: bool = False, interpret: bool = False):
    """Scatter-add ones at ``ids`` via the tiled Mosaic kernel.

    Convenience wrapper that pads hist_flat into the tiled layout and
    slices back (two full-histogram copies); engines that select this
    backend should hold the padded layout across passes and call
    scatter_bigtiles_padded directly.
    """
    nbins = hist_flat.shape[0]
    if tile_rows <= 0:
        tile_rows = BIGTILES_TILE_ROWS
    _, rows_pad = bigtiles_layout(nbins, tile_rows)
    pad = jnp.zeros((rows_pad * 128 - nbins,), hist_flat.dtype)
    hist_pad = jnp.concatenate([hist_flat, pad])
    out = scatter_bigtiles_padded(
        hist_pad, ids, nbins, tile_rows=tile_rows, chunk=chunk,
        slots=slots, unroll=unroll, mxu=mxu, interpret=interpret,
    )
    return out[:nbins]


def select_scatter_backend(name: str, canvas: Canvas, batch_points: int) -> str:
    """Resolve 'auto' to a concrete backend: the Mosaic RMW kernel
    ("pallas") for VMEM-resident histograms on real TPUs, XLA scatter-add
    everywhere else (CPU interpret runs, and canvases too large for the
    kernel's private-copy budget). The removed "sort" backend's demise is
    chronicled in the module docstring."""
    del batch_points  # kept for API stability
    if name == "sort":
        from cudabrot_tpu.config import ConfigError

        raise ConfigError(
            "the sort scatter backend was removed: measured slower than "
            "scatter-add at every realistic size on TPU and O(num_bins) "
            "per flush (device-faulting at production canvases); use "
            "--scatter xla (or auto)"
        )
    if name != "auto":
        return name
    if (
        PALLAS_SCATTER_AUTO
        and jax.default_backend() == "tpu"
        and pallas_scatter_rows(canvas.num_pixels) * 512
        <= PALLAS_SCATTER_VMEM_BUDGET
    ):
        return "pallas"
    if BIGTILES_AUTO and jax.default_backend() == "tpu":
        return "bigtiles"
    if SORTED_SCATTER_AUTO and jax.default_backend() == "tpu":
        return "sorted"
    return "xla"


def scatter_ids(hist_flat, ids, backend: str, *, interpret: bool = False,
                skip_chunks: bool = False):
    if backend == "xla":
        return scatter_xla(hist_flat, ids)
    if backend == "pallas":
        return scatter_pallas(hist_flat, ids, interpret=interpret,
                              skip_chunks=skip_chunks)
    if backend == "sorted":
        return scatter_sorted(hist_flat, ids)
    if backend == "bigtiles":
        return scatter_bigtiles(hist_flat, ids, interpret=interpret)
    raise ValueError(f"Unknown scatter backend: {backend}")


# ----------------------------------------------------------------------
# Metropolis-Hastings weighted deposits (--sampler mh).
#
# MH emissions carry the tenure's kernel-recorded visit bins plus
# (rep, t): the deposit is a pure integer scatter — no orbit replay
# exists anywhere (ops/pallas_kernels_mh.py module docstring explains
# why replay-based deposits were abandoned: replaying a chaotic orbit
# the chain SELECTED for window visits decorrelates and forfeits the
# selected mass — 99.96% measured at the 1e-5 benchmark window).
#
# Exact accounting, all in u32 (no x64 requirement on device):
#   v      = (t - 1) / TARGET_VISIT        kernel visit count (capped)
#   W      = rep * WEIGHT_SCALE * TARGET_VISIT
#   q      = floor(v * W / t)              total tenure deposit, in
#                                          1/WEIGHT_SCALE histogram units
#   d_k    = floor((k+1) q / n) - floor(k q / n),  n = min(v, V)
# The long division below computes q without overflow given the
# documented bounds: t <= 256*32767 + 1 < 2^23 (pallas_kernels_mh._T_VCAP),
# v <= 2^15, rep <= mh_rep_cap + flush windows <= 98303 < 2^17
# (config validation bounds mh_rep_cap <= 32767 and steps_per_flush
# <= 65536), so v*rep < 2^32, q <= rep*256 < 2^25, and (k+1)*q < 2^30.
# The host (uint64) twin in engines/host_replay.py computes the same
# floor(v*rep*65536/t) directly; the two agree exactly.
# ----------------------------------------------------------------------


def mh_deposit_weights(t, rep, visit_slots: int):
    """Per-recorded-bin deposit weights for MH emissions.

    ``t``: i32 (...,) chain target 256*v+1 (> 1 marks a depositable
    emission; anything <= 1 deposits nothing). ``rep``: i32 tenure
    chain steps. Returns ``(d, n, q)``: d u32 (visit_slots, ...) the
    Bresenham spread (exact: sum_k d_k == q), n i32 recorded-bin count,
    q u32 total deposit per emission (0 for invalid)."""
    tv = jnp.uint32(256)  # TARGET_VISIT (pallas_kernels_mh)
    valid = t > 1
    tu = jnp.where(valid, t, 1).astype(jnp.uint32)
    v = (tu - 1) // tv
    rep_u = jnp.maximum(rep, 0).astype(jnp.uint32)
    n = jnp.where(valid, jnp.minimum(v, jnp.uint32(visit_slots)), 1)
    n = jnp.maximum(n, 1)
    big_n = v * rep_u
    # q = floor(big_n * 65536 / tu): three u32-safe long-division steps.
    q1 = big_n // tu
    r1 = big_n - q1 * tu
    q2 = (r1 * 256) // tu
    r2 = r1 * 256 - q2 * tu
    q3 = (r2 * 256) // tu
    q = q1 * 65536 + q2 * 256 + q3
    q = jnp.where(valid, q, 0)
    ks = jnp.arange(visit_slots + 1, dtype=jnp.uint32).reshape(
        (visit_slots + 1,) + (1,) * t.ndim
    )
    kk = jnp.minimum(ks, n[None])
    pref = (kk * q[None]) // n[None]
    return pref[1:] - pref[:-1], n.astype(jnp.int32), q


def mh_scatter(hist_flat, bins, t, rep):
    """Scatter MH tenure deposits into a flat histogram.

    ``bins``: i32 (V, S) kernel-recorded visit bins (slots >= n hold
    stale values and are masked off); ``t``/``rep``: i32 (S,). Returns
    (hist_flat', deposits i32 (S,), mass u32 (S,)) where deposits is
    the per-emission recorded-bin count (0 if invalid) and mass the
    per-emission deposited total q."""
    visit_slots = bins.shape[0]
    d, n, q = mh_deposit_weights(t, rep, visit_slots)
    kidx = jax.lax.broadcasted_iota(jnp.int32, bins.shape, 0)
    take = (t[None] > 1) & (kidx < n[None])
    oob = jnp.int32(hist_flat.shape[0])
    idx = jnp.where(take, bins, oob)
    hist_flat = hist_flat.at[idx.reshape(-1)].add(
        d.astype(hist_flat.dtype).reshape(-1),
        mode="drop", indices_are_sorted=False, unique_indices=False,
    )
    deposits = jnp.where(t > 1, n, 0)
    return hist_flat, deposits, q
