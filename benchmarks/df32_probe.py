"""On-silicon validation probe for the df32 primitives.

The error-free transformations in ops/df32.py are only as good as the
compiler's float semantics: the XLA *CPU* emitter was measured
contracting mul+add into FMA against the UNROUNDED product (destroying
the error term at 2^-24 relative) — the hardening in ops/df32.py
(bitmask split + runtime-zero sealing) is designed to survive arbitrary
contraction.  This probe re-runs the exactness checks through BOTH TPU
compilation paths:

  * plain jit (XLA:TPU) — the path device replay uses;
  * a Pallas kernel (Mosaic) — the path the extended classify kernel
    uses.

Run on a TPU host: python benchmarks/df32_probe.py
Prints PASS/FAIL per check; exit code 0 iff everything passed.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudabrot_tpu.ops import df32

ROWS = 8


def _mk_inputs():
    rng = np.random.default_rng(42)
    x64 = rng.uniform(-2.0, 2.0, (ROWS, 128))
    y64 = rng.uniform(-2.0, 2.0, (ROWS, 128))
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    yh = y64.astype(np.float32)
    yl = (y64 - yh.astype(np.float64)).astype(np.float32)
    return x64, y64, xh, xl, yh, yl


def _mul_kernel(zero_ref, xh, xl, yh, yl, oh, ol):
    z = jnp.float32(zero_ref[0])
    h, l = df32.mul(xh[...], xl[...], yh[...], yl[...], z)
    oh[...] = h
    ol[...] = l


def _orbit_kernel(zero_ref, ch, cl, dh, dl, oh, ol, oi, oil):
    """40 df32 Mandelbrot steps from z = c (per-lane c)."""
    z = jnp.float32(zero_ref[0])
    crh, crl = ch[...], cl[...]
    cih, cil = dh[...], dl[...]

    def body(_, s):
        zr, zrl, zi, zil = s
        zr, zrl, zi, zil, _m = df32.complex_sqr_add(
            zr, zrl, zi, zil, crh, crl, cih, cil, z
        )
        return (zr, zrl, zi, zil)

    zr, zrl, zi, zil = jax.lax.fori_loop(
        0, 40, body, (crh, crl, cih, cil)
    )
    oh[...] = zr
    ol[...] = zrl
    oi[...] = zi
    oil[...] = zil


def _pallas(kernel, n_out, *args):
    shape = args[1].shape
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(args) - 1),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct(shape, f32)] * n_out,
        interpret=jax.default_backend() != "tpu",
    )(*args)


def main() -> int:
    x64, y64, xh, xl, yh, yl = _mk_inputs()
    zero = jnp.float32(0.0)
    ok = True

    def check(name, got64, ref64, bound):
        nonlocal ok
        err = np.max(np.abs(got64 - ref64) / np.maximum(np.abs(ref64), 1e-30))
        good = err <= bound
        ok = ok and good
        print(f"{'PASS' if good else 'FAIL'} {name}: rel err {err:.3e} "
              f"(bound {bound:.1e})")

    # --- plain jit (XLA backend) ---
    h, l = jax.jit(df32.mul)(xh, xl, yh, yl, zero)
    check("xla jit mul", df32.to_float64(h, l), x64 * y64, 2.0**-45)
    h, l = jax.jit(df32.sqr)(xh, xl, zero)
    check("xla jit sqr", df32.to_float64(h, l), x64 * x64, 2.0**-45)

    # --- pallas kernel (Mosaic) ---
    zarr = jnp.zeros((1,), jnp.float32)
    h, l = _pallas(_mul_kernel, 2, zarr, xh, xl, yh, yl)
    check("pallas mul", df32.to_float64(h, l), x64 * y64, 2.0**-45)

    # --- 40-step orbit in a pallas loop vs f64, on bounded seeds ---
    rng = np.random.default_rng(7)
    # Seeds in a disk where orbits stay bounded for 40 steps rarely —
    # use small |c| so the orbit stays finite and comparable.
    c64 = (rng.uniform(-0.1, 0.1, (ROWS, 128))
           + 1j * rng.uniform(-0.1, 0.1, (ROWS, 128)))
    ch = c64.real.astype(np.float32)
    cl = (c64.real - ch.astype(np.float64)).astype(np.float32)
    dh = c64.imag.astype(np.float32)
    dl = (c64.imag - dh.astype(np.float64)).astype(np.float32)
    cd = (ch.astype(np.float64) + cl.astype(np.float64)
          + 1j * (dh.astype(np.float64) + dl.astype(np.float64)))
    z = cd.copy()
    for _ in range(40):
        z = z * z + cd
    zr, zrl, zi, zil = _pallas(_orbit_kernel, 4, zarr, ch, cl, dh, dl)
    got = df32.to_float64(zr, zrl) + 1j * df32.to_float64(zi, zil)
    err = np.max(np.abs(got - z))
    good = err < 2.0**-40
    ok = ok and good
    print(f"{'PASS' if good else 'FAIL'} pallas 40-step orbit: "
          f"max abs err {err:.3e} (bound {2.0**-40:.1e})")

    # f32 comparison for scale.
    z32 = cd.astype(np.complex64)
    for _ in range(40):
        z32 = z32 * z32 + cd.astype(np.complex64)
    print(f"info: plain f32 orbit err {np.max(np.abs(z32 - z)):.3e}")
    print("OVERALL:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
