"""Image-level parity check against the CUDA reference's published
example gallery.

The reference ships tone-mapped renders with their exact CLI invocations
(README.md:132-157); tools/generate_examples.py re-renders the same
configurations with this engine. Both are Monte-Carlo estimates of the
same densities with different RNG streams and time budgets, so the
comparison is structural: Pearson correlation of the tone-mapped pixels
(optionally after a small blur to absorb per-pixel shot noise).

Usage: python tools/reference_parity.py [ref_examples_dir] [our_examples_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudabrot_tpu.io import png  # noqa: E402

PAIRS = [
    "gamma_1_0", "gamma_1_5", "gamma_2_2",
    "max_100", "max_1000", "max_20000",
    "cutoff_20", "cutoff_2000", "cutoff_10000",
    "cropped",
]


def _blur3(a: np.ndarray) -> np.ndarray:
    """3x3 box blur (absorbs per-pixel Monte-Carlo shot noise)."""
    p = np.pad(a, 1, mode="edge")
    out = np.zeros_like(a, dtype=np.float64)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out += p[1 + dy : 1 + dy + a.shape[0],
                     1 + dx : 1 + dx + a.shape[1]]
    return out / 9.0


def compare(ref_path: str, ours_path: str) -> float:
    a = _blur3(png.read_png(ref_path).astype(np.float64))
    b = _blur3(png.read_png(ours_path).astype(np.float64))
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    return float(np.corrcoef(a.ravel(), b.ravel())[0, 1])


def main() -> int:
    ref_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples"
    our_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "examples")
    )
    results = {}
    for name in PAIRS:
        rp = os.path.join(ref_dir, name + ".png")
        op = os.path.join(our_dir, name + ".png")
        if not (os.path.exists(rp) and os.path.exists(op)):
            print(f"{name:14s} SKIP (missing file)")
            continue
        corr = compare(rp, op)
        results[name] = corr
        print(f"{name:14s} corr={corr:.4f}")
    if not results:
        return 1
    worst = min(results.values())
    print(f"\nworst={worst:.4f} mean={np.mean(list(results.values())):.4f}")
    # The correlation ceiling is set by the *noisier* of the two images.
    # The reference gallery's sparse-band renders (e.g. gamma_1_0:
    # m=10000 c=8000 at 30 s on a GTX 970, linearly tone-mapped) carry
    # substantial shot noise of their own — measured by re-rendering our
    # side with 2.3x more samples and observing no correlation change
    # (0.8397 -> 0.8400).
    print("VERDICT:", "PARITY" if worst > 0.80 else "CHECK")
    return 0 if worst > 0.80 else 1


if __name__ == "__main__":
    sys.exit(main())
