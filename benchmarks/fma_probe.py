"""Cross-backend f32 orbit-stream agreement probe.

The MH estimator requires the classify kernel's f32 trajectory to
BIT-MATCH the native host replay's (pallas_kernels_mh.py module
docstring): acceptance is driven by the kernel's canvas-visit count,
and the replay deposits only where ITS recomputed trajectory visits.
Any arithmetic difference (FMA contraction order, reassociation)
decorrelates the chaotic orbit within tens of iterations, after which
the chains are selecting kernel-stream luck the replay cannot
reproduce — measured on silicon as a 44% lost-weight fraction and a
0.008 MH-vs-uniform histogram correlation at a 6e-3 crop
(mh_ab.py 2026-08-18), where the CPU run of the identical code
measures ~1.0.

This probe measures WHERE each backend pair first disagrees, for the
exact orbit expression the kernels use:

    r2 = zr*zr; i2 = zi*zi
    nzr = r2 - i2 + cr
    nzi = 2*zr*zi + ci

Backends:
  * numpy strict f32 (one rounding per op, no FMA — ground form)
  * native C++ compiled with csrc/Makefile's flags (-O3 -march=native,
    gcc default -ffp-contract=fast -> FMA on AVX512 hosts)
  * native C++ compiled with -ffp-contract=off
  * XLA CPU jit
  * Pallas kernel on the default backend (TPU when attached)

Usage: python benchmarks/fma_probe.py [steps]
Prints per-pair first-divergence step statistics over a batch of
long-lived c values near the seahorse valley.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 512

CSRC = r"""
extern "C" void orbit(const float* cr, const float* ci, int n,
                      int steps, float* out_r, float* out_i) {
  for (int j = 0; j < n; ++j) {
    float zr = cr[j], zi = ci[j];
    for (int s = 0; s < steps; ++s) {
      const float r2 = zr * zr;
      const float i2 = zi * zi;
      const float nzr = r2 - i2 + cr[j];
      const float nzi = 2.0f * zr * zi + ci[j];
      zr = nzr;
      zi = nzi;
      out_r[(long)s * n + j] = zr;
      out_i[(long)s * n + j] = zi;
    }
  }
}
"""


def build_native(extra_flags: str) -> ctypes.CDLL:
    d = tempfile.mkdtemp(prefix="fma_probe")
    src = os.path.join(d, "orbit.cpp")
    so = os.path.join(d, "orbit.so")
    with open(src, "w") as f:
        f.write(CSRC)
    # Mirror csrc/Makefile's optimization flags.
    cmd = (
        f"g++ -O3 -march=native -funroll-loops -fno-math-errno -fPIC "
        f"{extra_flags} -shared -o {so} {src}"
    )
    subprocess.run(cmd, shell=True, check=True)
    lib = ctypes.CDLL(so)
    lib.orbit.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    return lib


def run_native(lib, cr, ci, steps):
    n = cr.size
    out_r = np.empty((steps, n), np.float32)
    out_i = np.empty((steps, n), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.orbit(
        cr.ctypes.data_as(fp), ci.ctypes.data_as(fp), n, steps,
        out_r.ctypes.data_as(fp), out_i.ctypes.data_as(fp),
    )
    return out_r, out_i


def run_numpy(cr, ci, steps):
    zr = cr.copy()
    zi = ci.copy()
    out_r = np.empty((steps, cr.size), np.float32)
    out_i = np.empty((steps, cr.size), np.float32)
    two = np.float32(2.0)
    for s in range(steps):
        r2 = zr * zr
        i2 = zi * zi
        nzr = (r2 - i2) + cr
        nzi = two * zr * zi + ci
        zr, zi = nzr, nzi
        out_r[s] = zr
        out_i[s] = zi
    return out_r, out_i


def run_xla_cpu(cr, ci, steps):
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]

    @jax.jit
    def go(cr, ci):
        def body(_, st):
            zr, zi, tr, ti, s = st
            r2 = zr * zr
            i2 = zi * zi
            nzr = r2 - i2 + cr
            nzi = 2.0 * zr * zi + ci
            tr = jax.lax.dynamic_update_index_in_dim(tr, nzr, s, 0)
            ti = jax.lax.dynamic_update_index_in_dim(ti, nzi, s, 0)
            return nzr, nzi, tr, ti, s + 1

        tr = jnp.zeros((steps, cr.size), jnp.float32)
        ti = jnp.zeros((steps, cr.size), jnp.float32)
        _, _, tr, ti, _ = jax.lax.fori_loop(
            0, steps, body, (cr, ci, tr, ti, 0)
        )
        return tr, ti

    with jax.default_device(cpu):
        tr, ti = go(jnp.asarray(cr), jnp.asarray(ci))
    return np.asarray(tr), np.asarray(ti)


def run_pallas(cr, ci, steps):
    """The kernels' expression inside a real Pallas kernel on the
    default backend (TPU when attached; CPU interpret otherwise)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    n = cr.size
    # Pad lanes to the fp32 tile (8, 128).
    lanes = max(128, ((n + 127) // 128) * 128)
    cr8 = np.zeros((8, lanes), np.float32)
    ci8 = np.zeros((8, lanes), np.float32)
    cr8[0, :n] = cr
    ci8[0, :n] = ci

    def kernel(cr_ref, ci_ref, tr_ref, ti_ref):
        zr = cr_ref[...]
        zi = ci_ref[...]
        cr = cr_ref[...]
        ci = ci_ref[...]

        def body(s, st):
            zr, zi = st
            r2 = zr * zr
            i2 = zi * zi
            nzr = r2 - i2 + cr
            nzi = 2.0 * zr * zi + ci
            tr_ref[s] = nzr
            ti_ref[s] = nzi
            return nzr, nzi

        jax.lax.fori_loop(0, steps, body, (zr, zi))

    tr, ti = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((steps, 8, lanes), jnp.float32),
            jax.ShapeDtypeStruct((steps, 8, lanes), jnp.float32),
        ),
    )(jnp.asarray(cr8), jnp.asarray(ci8))
    tr = np.asarray(tr)[:, 0, :n]
    ti = np.asarray(ti)[:, 0, :n]
    return tr, ti


def first_divergence(a, b):
    """Per-column first step where (r, i) bit-differ; steps if never."""
    ar, ai = a
    br, bi = b
    neq = (ar.view(np.uint32) != br.view(np.uint32)) | (
        ai.view(np.uint32) != bi.view(np.uint32)
    )
    steps, n = neq.shape
    idx = np.where(neq.any(axis=0), neq.argmax(axis=0), steps)
    return idx


def main():
    # Long-lived c values: iterate candidates in f64 and keep those
    # surviving STEPS steps (boundary-adjacent, chaotic — the hard case).
    rng = np.random.default_rng(7)
    picked = []
    while len(picked) < 64:
        c = (
            rng.uniform(-0.76, -0.72, 256)
            + 1j * rng.uniform(0.11, 0.15, 256)
        )
        z = np.zeros_like(c)
        alive = np.ones(c.shape, bool)
        for _ in range(STEPS + 8):
            z = np.where(alive, z * z + c, z)
            alive &= np.abs(z) <= 2.0
        picked.extend(c[alive][: 64 - len(picked)])
    c = np.asarray(picked)
    cr = c.real.astype(np.float32)
    ci = c.imag.astype(np.float32)

    results = {
        "numpy_strict": run_numpy(cr, ci, STEPS),
        "native_default": run_native(build_native(""), cr, ci, STEPS),
        "native_nocontract": run_native(
            build_native("-ffp-contract=off"), cr, ci, STEPS
        ),
        "xla_cpu": run_xla_cpu(cr, ci, STEPS),
        "pallas": run_pallas(cr, ci, STEPS),
    }
    import jax

    print(f"pallas backend: {jax.default_backend()}  steps={STEPS}  "
          f"n={cr.size}")
    names = list(results)
    print(f"{'pair':44s} {'median':>7s} {'min':>5s} {'agree%':>7s}")
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            d = first_divergence(results[a], results[b])
            agree = 100.0 * (d >= STEPS).mean()
            print(
                f"{a + ' vs ' + b:44s} {int(np.median(d)):7d} "
                f"{int(d.min()):5d} {agree:6.1f}%"
            )


if __name__ == "__main__":
    main()
