"""The strict (contraction-proof) native f32 replay contract.

The Mosaic TPU compiler lowers the classify kernels' f32 orbit step
with strict one-rounding-per-op semantics, while gcc and XLA's CPU
emitter both contract the multiply-add pairs into FMAs (measured:
benchmarks/fma_probe.py — Pallas-on-TPU bit-matches a strict numpy
loop for 512 iterations while XLA-CPU bit-matches the gcc-contracted
native build). Estimators that condition kernel-side selection on the
kernel's own trajectory (the canvas emit filter) need
the native replay to BIT-MATCH the kernel stream, so the native
library carries both arithmetic variants behind flags bit 1
(csrc/tpubrot_native.cpp "strict") and the engine selects strict for
TPU-classified f32 payloads.

These tests pin the strict variant to a pure-python strict f32
reference — the same ground form Mosaic compiles to — so the contract
holds on any build host regardless of its compiler's contraction
behavior.
"""

from __future__ import annotations

import numpy as np
import pytest

from cudabrot_tpu.io import native

if not native.available():  # pragma: no cover
    pytest.skip("native library unavailable", allow_module_level=True)

W = H = 64
CANVAS = dict(
    width=W, height=H, min_real=-2.0, min_imag=-2.0,
    delta_real=4.0 / W, delta_imag=4.0 / H,
)


def _classify_strict(cr, ci, max_it=200, min_it=5):
    """Escape indices from a strict-f32 vectorized loop (band filter
    mirrors cudabrot.cu:407-408)."""
    zr = cr.copy()
    zi = ci.copy()
    esc = np.full(cr.shape, -1, np.int32)
    with np.errstate(invalid="ignore", over="ignore"):
        for s in range(max_it):
            r2 = zr * zr
            i2 = zi * zi
            nzr = (r2 - i2) + cr
            nzi = np.float32(2.0) * zr * zi + ci
            zr, zi = nzr, nzi
            hit = (esc < 0) & ~(zr * zr + zi * zi <= 4.0)
            esc[hit] = s
    return np.where((esc >= min_it) & (esc < max_it), esc, -1).astype(
        np.int32
    )


def _replay_strict_numpy(cr, ci, iters, *, ship=False):
    """Scalar strict-f32 replay: the ground-truth deposit pattern the
    strict native variant must reproduce bitwise."""
    hist = np.zeros((H, W), np.uint64)
    minr = np.float32(CANVAS["min_real"])
    mini = np.float32(CANVAS["min_imag"])
    inv_dr = np.float32(1.0 / CANVAS["delta_real"])
    inv_di = np.float32(1.0 / CANVAS["delta_imag"])
    f32 = np.float32
    with np.errstate(over="ignore", invalid="ignore"):
        for j in range(len(cr)):
            lim = int(iters[j])
            if lim < 0:
                continue
            zr, zi = f32(cr[j]), f32(ci[j])
            for _s in range(lim + 1):
                r, im = (abs(zr), abs(zi)) if ship else (zr, zi)
                r2 = f32(r * r)
                i2 = f32(im * im)
                q = f32(f32(f32(2.0) * r) * im)
                zr = f32(f32(r2 - i2) + f32(cr[j]))
                zi = f32(q + f32(ci[j]))
                # NaN compares False; inf/NaN bin coordinates saturate
                # in the native conversions and are rejected by the
                # bound checks either way.
                if not (zr >= minr and zi >= mini):
                    continue
                colf = f32(zr - minr) * inv_dr
                rowf = f32(zi - mini) * inv_di
                if not (np.isfinite(colf) and np.isfinite(rowf)):
                    continue
                col = int(colf)
                row = int(rowf)
                if 0 <= row < H and 0 <= col < W:
                    hist[row, col] += 1
    return hist


@pytest.fixture(scope="module")
def payload():
    rng = np.random.default_rng(11)
    cr = rng.uniform(-2, 2, 4096).astype(np.float32)
    ci = rng.uniform(-2, 2, 4096).astype(np.float32)
    iters = _classify_strict(cr, ci)
    assert (iters >= 0).sum() > 50  # enough live emissions to mean something
    return cr, ci, iters


def _native(cr, ci, iters, *, strict, threads=1, ship=False, dtype=np.uint32):
    hist = np.zeros((H, W), dtype)
    native.replay_scatter(
        cr, ci, iters, hist, burning_ship=ship, num_threads=threads,
        strict=strict, **CANVAS,
    )
    return hist


def test_strict_matches_numpy_strict_bitwise(payload):
    cr, ci, iters = payload
    ref = _replay_strict_numpy(cr, ci, iters)
    got = _native(cr, ci, iters, strict=True)
    assert np.array_equal(got.astype(np.uint64), ref)


def test_strict_burning_ship_matches_numpy(payload):
    cr, ci, iters = payload
    # Reuse escape indices as replay bounds; the ship fold changes the
    # trajectories but the deposit contract (replay exactly iters+1
    # strict steps) is what's under test.
    ref = _replay_strict_numpy(cr, ci, iters, ship=True)
    got = _native(cr, ci, iters, strict=True, ship=True)
    assert np.array_equal(got.astype(np.uint64), ref)


def test_strict_multithreaded_bitwise(payload):
    cr, ci, iters = payload
    one = _native(cr, ci, iters, strict=True, threads=1)
    four = _native(cr, ci, iters, strict=True, threads=4)
    assert np.array_equal(one, four)


def test_strict_uint64_hist(payload):
    cr, ci, iters = payload
    u32 = _native(cr, ci, iters, strict=True)
    u64 = _native(cr, ci, iters, strict=True, dtype=np.uint64)
    assert np.array_equal(u32.astype(np.uint64), u64)


def test_engine_selects_strict_on_tpu_only(monkeypatch):
    """The worker runs strict exactly when the kernel compiled under
    Mosaic (TPU) AND the estimator needs stream agreement (MH / canvas
    emit filter) AND the payload is f32 (extended replays in f64)."""
    import jax

    from cudabrot_tpu.config import (
        Canvas,
        EngineOptions,
        IterationBand,
        RenderConfig,
    )
    from cudabrot_tpu.engines.pallas_engine import PallasEngine

    def build(backend, **opts):
        monkeypatch.setattr(jax, "default_backend", lambda: backend)
        cfg = RenderConfig(
            canvas=Canvas(width=64, height=64),
            band=IterationBand(
                max_escape_iterations=100, min_escape_iterations=10
            ),
            options=EngineOptions(replay="host", **opts),
        )
        eng = PallasEngine(cfg)
        try:
            return eng._worker.strict
        finally:
            eng._worker.close()

    # MH never uses strict replay anymore: its deposits are
    # kernel-recorded bins (ops/pallas_kernels_mh.py), not replayed
    # trajectories — so even TPU-classified MH payloads skip strict.
    assert build("cpu", sampler="mh") is False
    assert build("tpu", sampler="mh") is False
    assert build("tpu", emit_filter="canvas") is True
    assert build("tpu") is False  # plain uniform: statistical contract
