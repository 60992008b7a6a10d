"""MXU tabular suite pinned to goldens (VERDICT r2 #9): float-association
drift in the matmul TD path breaks this test instead of silently shifting
the RESULTS.md cross-engine table. Goldens regenerate with
``python tools/mxu_goldens.py --update`` (CPU backend, same as CI)."""
import json
import sys

import pytest

sys.path.insert(0, "/root/repo")

from tools.mxu_goldens import ALIASES, GOLDEN_PATH, run_alias  # noqa: E402

pytestmark = pytest.mark.slow  # heavy tier

# Same jax/backend ⇒ bit-identical replay; the band absorbs a jax upgrade
# changing reduction order without letting a real TD change through (the
# observed tomato association shift moved the return by ~8).
TOL = 3.0


@pytest.fixture(scope="module")
def goldens():
    with open("/root/repo/" + GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("alias", ALIASES)
def test_mxu_suite_matches_golden(alias, goldens):
    got = run_alias(alias)
    want = goldens[alias]
    assert abs(got["return"] - want["return"]) <= TOL, (alias, got, want)
    assert abs(got["hidden"] - want["hidden"]) <= TOL, (alias, got, want)
