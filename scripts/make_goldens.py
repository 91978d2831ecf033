"""Regenerate the committed golden renders (tests/golden/*.npz).

Run ONLY when an estimator/tonemap change is intentional; commit the diff
together with the change that motivated it (SURVEY.md section 4: golden
images per config rung; the reference's only golden is renders/render.png,
save_render.cuh:66).

Usage: python scripts/make_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> None:
    from golden_cases import GOLDENS, render_case

    out_dir = os.path.join(_REPO, "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name in GOLDENS:
        img = render_case(name)
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(path, image=img)
        print(f"{name}: wrote {path} mean={img.mean():.5f}")


if __name__ == "__main__":
    main()
