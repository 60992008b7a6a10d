"""Learning-curve regression vs stored seed goldens (SURVEY.md §4 item 3).

Goldens (tests/goldens/curves.json, regenerated with
``python tools/curves.py --update``) hold eval curves for 3 seeds per
config; a fresh seed-0 run must land inside the stored seed band ± tol.
"""
import json
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.curves import CONFIGS, GOLDEN_PATH, collect_curve  # noqa: E402

pytestmark = pytest.mark.slow  # heavy tier: subprocess / golden-curve / tool e2e

TOL = 5.0


@pytest.fixture(scope="module")
def goldens():
    with open("/root/repo/" + GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: c["name"])
def test_curve_within_seed_band(cfg, goldens):
    stored = goldens[cfg["name"]]
    best_band = [max(p["return"] for p in curve) for curve in stored.values()]
    hidden_band = [curve[-1]["hidden"] for curve in stored.values()]

    curve = collect_curve(cfg, seed=0)
    best = max(p["return"] for p in curve)
    assert min(best_band) - TOL <= best <= max(best_band) + TOL, (
        f"{cfg['name']}: best eval return {best} outside stored band {best_band}"
    )
    final_hidden = curve[-1]["hidden"]
    assert (
        min(hidden_band) - TOL <= final_hidden <= max(hidden_band) + TOL
    ), f"{cfg['name']}: final hidden {final_hidden} outside band {hidden_band}"
