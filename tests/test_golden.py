"""Golden-render regression suite (the automated descendant of the
reference's examples/ gallery + version_timing.txt statistical anchors,
SURVEY.md §4).

Each golden fixture is a small deterministic oracle render committed to
tests/golden/. Re-rendering must reproduce the same *distribution*:
same-version runs are bitwise reproducible, but the committed goldens
are compared statistically so legitimate cross-version RNG/codegen
drift doesn't break the suite while semantic regressions (band
boundaries, culls, binning, tone-map inputs) still do.
"""

import os

import numpy as np
import pytest

from tools.generate_golden import CASES, GOLDEN_DIR, render


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden_distribution(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing golden fixture {path}; run tools/generate_golden.py"
    )
    with np.load(path) as data:
        want = data["hist"].astype(np.float64)

    got = render(CASES[name]).astype(np.float64)
    assert got.shape == want.shape
    assert want.sum() > 0 and got.sum() > 0

    # Total mass: catches band-filter / cull / replay-length regressions.
    mass_ratio = got.sum() / want.sum()
    assert 0.97 <= mass_ratio <= 1.03, mass_ratio

    # Distribution shape: catches binning / geometry regressions.
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.995, corr


def test_render_is_deterministic_within_version():
    """Two renders of the same config must agree bitwise (fixed seed,
    deterministic accumulation — unlike the reference's racy adds)."""
    a = render(CASES["default_band"])
    b = render(CASES["default_band"])
    np.testing.assert_array_equal(a, b)
