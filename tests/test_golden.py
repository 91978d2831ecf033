"""Golden-image regression tests (SURVEY.md section 4; VERDICT r3 #5).

The committed arrays in tests/golden/ pin the ENTIRE image pipeline --
parsers/scene assembly, intersector, BSDF/NEE estimator, RNG streams, ACES
+ sRGB tonemap -- at deterministic seeds on the CPU backend. Any change to
rendered values must regenerate them intentionally:

    python scripts/make_goldens.py

The tolerance is loose enough for XLA-version reassociation (1e-4 after an
8-bit-scale tonemap) but tight enough that any estimator change (e.g. an
NEE weight or emittance-bookkeeping tweak) fails loudly.
"""

import os

import numpy as np
import pytest

from golden_cases import GOLDENS, render_case

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name", GOLDENS)
def test_golden_image(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing golden {path}; run scripts/make_goldens.py"
    )
    with np.load(path) as data:
        want = data["image"]
    got = render_case(name)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, err_msg=(
        f"golden '{name}' drifted -- if the estimator change is intentional, "
        "regenerate via scripts/make_goldens.py and commit the diff"
    ))
