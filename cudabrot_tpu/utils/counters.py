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


def u64_pair(value: int):
    """Constant (lo, hi) pair from a Python int (value < 2^64)."""
    return (
        jnp.uint32(value & 0xFFFFFFFF),
        jnp.uint32((value >> 32) & 0xFFFFFFFF),
    )


def u64_add_pair(acc, pair):
    """acc += pair, both (lo, hi) uint32 pairs."""
    lo, hi = acc
    plo, phi = pair
    new_lo = lo + plo
    carry = (new_lo < lo).astype(jnp.uint32)
    return (new_lo, hi + phi + carry)


def u64_sub_pair(a, b):
    """a - b for (lo, hi) uint32 pairs; caller guarantees a >= b."""
    alo, ahi = a
    blo, bhi = b
    lo = alo - blo
    borrow = (alo < blo).astype(jnp.uint32)
    return (lo, ahi - bhi - borrow)


def u64_sum_i32(v):
    """Exact (lo, hi) uint32-pair sum of a non-negative int32 array.

    Splits each element into bytes so the four partial uint32 sums
    cannot wrap (safe for up to 2^24 elements — far above any lane
    count), then recombines with carries. This is what lets per-PASS
    stat totals exceed 2^32 (long passes amortize dispatch overhead)
    while JAX's default no-64-bit-int config still holds.
    """
    # Static (trace-time) guard: beyond 2^24 elements a byte-plane partial
    # sum can wrap uint32 and the total silently corrupts.
    if v.size > (1 << 24):
        raise ValueError(
            f"u64_sum_i32 is exact only up to 2^24 elements, got {v.size}"
        )
    v = v.astype(jnp.uint32)
    lo = jnp.uint32(0)
    hi = jnp.uint32(0)
    for shift in (0, 8, 16, 24):
        part = jnp.sum(
            (v >> jnp.uint32(shift)) & jnp.uint32(0xFF), dtype=jnp.uint32
        )
        if shift:
            add_lo = part << jnp.uint32(shift)
            add_hi = part >> jnp.uint32(32 - shift)
        else:
            add_lo = part
            add_hi = jnp.uint32(0)
        new_lo = lo + add_lo
        carry = (new_lo < lo).astype(jnp.uint32)
        lo = new_lo
        hi = hi + add_hi + carry
    return (lo, hi)
