import jax.numpy as jnp
import numpy as np

from cudabrot_tpu.config import Canvas
from cudabrot_tpu.ops import binning
from tests import reference_impl as ref


def _random_points(n, seed=0, lo=-2.5, hi=2.5):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=(2, n))


def test_bin_ids_match_scalar_reference():
    canvas = Canvas(width=37, height=23, min_real=-1.3, max_real=0.9,
                    min_imag=-0.4, max_imag=1.1)
    re, im = _random_points(4096)
    ids = np.asarray(
        binning.points_to_bin_ids(
            canvas,
            jnp.asarray(re),
            jnp.asarray(im),
            jnp.ones(re.shape, bool),
        )
    )
    for k in range(len(re)):
        rc = ref.bin_point(re[k], im[k], canvas)
        if rc is None:
            assert ids[k] == canvas.num_pixels
        else:
            r, c = rc
            assert ids[k] == r * canvas.width + c


def test_bin_ids_invalid_masked():
    canvas = Canvas(width=8, height=8)
    ids = binning.points_to_bin_ids(
        canvas,
        jnp.asarray([0.0]),
        jnp.asarray([0.0]),
        jnp.asarray([False]),
    )
    assert int(ids[0]) == canvas.num_pixels


def test_low_boundary_guard():
    """Points just below the canvas minimum must not land in row/col 0
    (the truncation artifact guarded at cudabrot.cu:305-308)."""
    canvas = Canvas(width=10, height=10, min_real=0.0, max_real=1.0,
                    min_imag=0.0, max_imag=1.0)
    ids = binning.points_to_bin_ids(
        canvas,
        jnp.asarray([-1e-9, 0.5]),
        jnp.asarray([0.5, -1e-9]),
        jnp.ones(2, bool),
    )
    assert int(ids[0]) == canvas.num_pixels
    assert int(ids[1]) == canvas.num_pixels


def test_scatter_xla_matches_bincount():
    canvas = Canvas(width=16, height=12)
    num_bins = canvas.num_pixels
    rng = np.random.default_rng(3)
    ids = rng.integers(0, num_bins + 1, size=2048)  # includes sentinel
    hist0 = jnp.zeros(num_bins, jnp.uint32)
    a = np.asarray(binning.scatter_xla(hist0, jnp.asarray(ids)))
    want = np.bincount(ids[ids < num_bins], minlength=num_bins)
    np.testing.assert_array_equal(a, want)


def test_scatter_xla_accumulates_on_existing():
    hist0 = jnp.arange(10, dtype=jnp.uint32)
    ids = jnp.asarray([0, 0, 9, 10, 10])  # 10 == sentinel (num_bins)
    out = np.asarray(binning.scatter_xla(hist0, ids))
    want = np.arange(10)
    want[0] += 2
    want[9] += 1
    np.testing.assert_array_equal(out, want)


def test_scatter_pallas_matches_xla_bitwise():
    """The Mosaic RMW scatter must be bitwise-identical to XLA
    scatter-add: exact integer adds in a different deposit order."""
    for nbins, n, slots, seed in (
        (16 * 12, 2048, 1, 0),    # tail row (192 = 1.5 * 128)
        (1024, 4096, 4, 1),       # exact multiple of 128
        (777, 2000, 2, 2),        # odd nbins, odd n (padding path)
        (777, 2000, 8, 3),
    ):
        rng = np.random.default_rng(seed)
        ids = rng.integers(0, nbins + 1, size=n)  # includes sentinel
        hist0 = jnp.arange(nbins, dtype=jnp.uint32)  # non-zero start
        want = np.asarray(binning.scatter_xla(hist0, jnp.asarray(ids)))
        got = np.asarray(
            binning.scatter_pallas(
                hist0, jnp.asarray(ids, jnp.int32), slots=slots,
                interpret=True,
            )
        )
        np.testing.assert_array_equal(got, want)


def test_scatter_pallas_skip_chunks_matches_xla_bitwise():
    """The r5 skip-flag path (all-sentinel chunks skip the deposit loop)
    must not change results: flags only gate chunks with nothing to
    deposit. Streams are built with contiguous sentinel runs (the
    batched replay's chunk-tail layout) plus interleaved real ids."""
    for nbins, n, seed in (
        (16 * 12, 4096, 0),
        (1024, 8192, 1),
        (777, 5000, 2),       # padding path: pad chunk is all-sentinel
    ):
        rng = np.random.default_rng(seed)
        ids = rng.integers(0, nbins + 1, size=n)
        # Carve contiguous all-sentinel runs covering whole 1024-chunks
        # (scatter_pallas floors chunk at 128*slots = 1024 for slots=8).
        ids[1024:2048] = nbins
        ids[-1024:] = nbins
        hist0 = jnp.arange(nbins, dtype=jnp.uint32)
        want = np.asarray(binning.scatter_xla(hist0, jnp.asarray(ids)))
        got = np.asarray(
            binning.scatter_pallas(
                hist0, jnp.asarray(ids, jnp.int32), chunk=1024,
                interpret=True, skip_chunks=True,
            )
        )
        np.testing.assert_array_equal(got, want)
    # Fully-sentinel stream: every chunk skips; output unchanged.
    hist0 = jnp.arange(256, dtype=jnp.uint32)
    allsent = jnp.full((2048,), 256, jnp.int32)
    out = np.asarray(
        binning.scatter_pallas(hist0, allsent, chunk=1024,
                               interpret=True, skip_chunks=True)
    )
    np.testing.assert_array_equal(out, np.arange(256))


def test_scatter_sorted_matches_xla_bitwise():
    """The sorted (sort + run-length collapse + unique scatter) backend
    must be bitwise-identical to XLA scatter-add: exact integer adds in
    a different deposit order."""
    for nbins, n, seed in (
        (16 * 12, 2048, 0),
        (1024, 4096, 1),
        (777, 2000, 2),     # odd nbins/odd n
        (50, 4096, 3),      # collision-heavy (collapse does real work)
    ):
        rng = np.random.default_rng(seed)
        ids = rng.integers(0, nbins + 1, size=n)  # includes sentinel
        hist0 = jnp.arange(nbins, dtype=jnp.uint32)  # non-zero start
        want = np.asarray(binning.scatter_xla(hist0, jnp.asarray(ids)))
        got = np.asarray(
            binning.scatter_sorted(hist0, jnp.asarray(ids, jnp.int32))
        )
        np.testing.assert_array_equal(got, want)
    # All-sentinel batch (replay calls with no on-canvas points).
    hist0 = jnp.arange(64, dtype=jnp.uint32)
    allsent = jnp.full((512,), 64, jnp.int32)
    out = np.asarray(binning.scatter_sorted(hist0, allsent))
    np.testing.assert_array_equal(out, np.arange(64))


def test_scatter_ids_sorted_backend_dispatch():
    hist0 = jnp.zeros(256, jnp.uint32)
    ids = jnp.asarray([0, 1, 1, 255, 256], jnp.int32)  # 256 == sentinel
    out = np.asarray(binning.scatter_ids(hist0, ids, "sorted"))
    assert out[0] == 1 and out[1] == 2 and out[255] == 1
    assert out.sum() == 4


def test_scatter_ids_pallas_backend_dispatch():
    hist0 = jnp.zeros(256, jnp.uint32)
    ids = jnp.asarray([0, 1, 1, 255, 256], jnp.int32)  # 256 == sentinel
    out = np.asarray(
        binning.scatter_ids(hist0, ids, "pallas", interpret=True)
    )
    assert out[0] == 1 and out[1] == 2 and out[255] == 1
    assert out.sum() == 4


def test_backend_selection():
    small = Canvas(width=100, height=100)
    big = Canvas(width=20000, height=20000)
    # auto resolves per-backend: the Mosaic RMW kernel on real TPUs with
    # VMEM-resident histograms (once PALLAS_SCATTER_AUTO is measured-on),
    # XLA scatter-add on CPU (these tests) and at canvases past the VMEM
    # budget (PERF_NOTES.md).
    import jax

    expected_small = (
        "pallas"
        if binning.PALLAS_SCATTER_AUTO and jax.default_backend() == "tpu"
        else "xla"
    )
    assert (
        binning.select_scatter_backend("auto", small, 1 << 20)
        == expected_small
    )
    assert binning.select_scatter_backend("auto", big, 1 << 16) == "xla"
    assert binning.select_scatter_backend("xla", small, 1) == "xla"
    # The sort backend was removed (measured dead, device-faulting at
    # production canvases); selecting it must fail with a pointer, not
    # crash mid-render.
    import pytest

    from cudabrot_tpu.config import ConfigError

    with pytest.raises(ConfigError, match="removed"):
        binning.select_scatter_backend("sort", small, 1)


def test_sharded_bin_ids_partition_the_canvas():
    """Summing per-shard local histograms must reproduce the unsharded
    result exactly — every point maps to exactly one shard."""
    canvas = Canvas(width=16, height=12)
    rng = np.random.default_rng(7)
    re, im = rng.uniform(-2.5, 2.5, size=(2, 4096))
    valid = jnp.ones(re.shape, bool)
    full_ids = np.asarray(
        binning.points_to_bin_ids(canvas, jnp.asarray(re), jnp.asarray(im),
                                  valid)
    )
    want = np.bincount(full_ids[full_ids < canvas.num_pixels],
                       minlength=canvas.num_pixels).reshape(canvas.shape)

    rows_per = 3  # 4 shards of 3 rows
    got = np.zeros(canvas.shape, np.int64)
    for s in range(4):
        ids = np.asarray(
            binning.points_to_bin_ids_sharded(
                canvas, jnp.asarray(re), jnp.asarray(im), valid,
                row_start=jnp.int32(s * rows_per), row_count=rows_per,
            )
        )
        local = np.bincount(ids[ids < rows_per * canvas.width],
                            minlength=rows_per * canvas.width)
        got[s * rows_per:(s + 1) * rows_per] = local.reshape(
            rows_per, canvas.width
        )
    np.testing.assert_array_equal(got, want)


def test_scatter_bigtiles_matches_xla_bitwise():
    """The tiled Mosaic backend (sort + tile-streaming RMW, interpret
    mode here) must be bitwise-identical to XLA scatter-add, including
    untouched tiles (in-place aliasing), duplicates, sentinels, and the
    middle-tile residue path. Both deposit paths: the scalar RMW loop
    and the MXU one-hot-contraction windows (whose end-of-tile clip and
    scalar-fallback suffix get dedicated cases)."""
    TR, CH, SL, UN = 256, 256, 4, 4
    nbins = 300_000  # 10 tiles at 32768 bins/tile
    rng = np.random.default_rng(3)

    def check(ids, mxu):
        hist0 = jnp.asarray(rng.integers(0, 5, nbins), jnp.uint32)
        want = np.asarray(binning.scatter_xla(hist0, jnp.asarray(ids)))
        got = np.asarray(
            binning.scatter_bigtiles(
                hist0, jnp.asarray(ids, jnp.int32), tile_rows=TR,
                chunk=CH, slots=SL, unroll=UN, mxu=mxu, interpret=True,
            )
        )
        np.testing.assert_array_equal(got, want)

    # Clustered + uniform + 10% sentinels (production replay mix).
    p = 5000
    ids = np.concatenate([
        rng.integers(0, nbins // 50, p // 2),
        rng.integers(0, nbins, p - p // 2),
    ])
    ids[rng.random(p) < 0.1] = nbins
    cases = [
        ids,
        # One chunk spanning many tiles: forces the lax.cond residue.
        np.linspace(0, nbins - 1, CH * 2, dtype=np.int32),
        # Max duplicates: one id repeated across several chunks.
        np.full(CH * 3, 12345, np.int32),
        # Fewer ids than one chunk (padding path).
        np.asarray([0, 1, nbins, nbins - 1], np.int32),
        # Everything in the LAST tile (sentinel tile) only.
        np.full(CH, nbins - 1, np.int32),
        # Tile-end cluster: the MXU window clip slides back over the
        # previous window (the double-deposit hazard case).
        np.concatenate([
            np.arange(TR * 128 - 300, TR * 128, 2, dtype=np.int32),
            rng.integers(TR * 128 - 5000, TR * 128, 500),
        ]),
        # One group spanning the whole tile: multi-window + scalar
        # fallback suffix.
        np.linspace(0, TR * 128 - 1, 128, dtype=np.int32),
    ]
    for c in cases:
        check(c, mxu=False)
        check(c, mxu=True)


def test_bigtiles_layout_covers_sentinel():
    for nbins in (1, 127, 128, 32768, 300_000, 4_000_000):
        ntiles, rows_pad = binning.bigtiles_layout(nbins, 256)
        assert rows_pad == ntiles * 256
        assert rows_pad * 128 >= nbins + 1  # sentinel cell exists
