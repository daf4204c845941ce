"""Device-side 64-bit statistic accumulators built from uint32 pairs.

Renders accumulate > 2^32 iterations within minutes, but JAX disables
64-bit integers by default (and TPUs emulate them slowly), so long-running
counters live in the engine state as (lo, hi) uint32 pairs with explicit
carry propagation. Values cross to the host (as exact Python ints) only
when stats are read — never per pass. The reference instead prints a
pass *count* and recomputes everything else offline (cudabrot.cu:498-499).
"""

from __future__ import annotations

import jax.numpy as jnp


def u64_zero():
    return (jnp.uint32(0), jnp.uint32(0))


def u64_add(acc, value_u32):
    """acc += value, where value is a uint32 per-pass increment."""
    lo, hi = acc
    value = value_u32.astype(jnp.uint32)
    new_lo = lo + value  # wraps mod 2^32
    carry = (new_lo < lo).astype(jnp.uint32)
    return (new_lo, hi + carry)


def u64_value(acc) -> int:
    """Exact host-side value (call outside jit)."""
    lo, hi = acc
    return (int(hi) << 32) | int(lo)
