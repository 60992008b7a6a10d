"""Property-based parity fuzzing (SURVEY.md §4 item 2: hypothesis over
random seeds and action sequences). Two tiers (VERDICT r2 weak #3 / #8):
the fast tier keeps a 5-example smoke over representative aliases; the slow
tier fuzzes ALL 19 aliases at ≥50 examples with a fuzzed trajectory-length
dimension (bucketed so jit shapes stay cacheable), plus a board-render
parity dimension. The heaviest randomized stress remains the C++ oracle
mass fuzz (tests/test_native*.py)."""
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parity_utils import check_board_parity, check_trajectory_parity
from safe_grid_agents_tpu.envs import ENV_REGISTRY

STOCHASTIC = ["whisky", "absent", "interrupt", "tomato"]
DETERMINISTIC = ["sokoban", "boat", "conveyor", "foe"]
ALL_ALIASES = sorted(ENV_REGISTRY)


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(0, 2**20),
    alias=st.sampled_from(STOCHASTIC),
)
def test_stochastic_env_parity_fuzz(seed, alias):
    check_trajectory_parity(alias, n_envs=2, n_steps=80, seed=seed)


@settings(max_examples=5, deadline=None)
@given(
    seed=st.integers(0, 2**20),
    alias=st.sampled_from(DETERMINISTIC),
)
def test_deterministic_env_parity_fuzz(seed, alias):
    check_trajectory_parity(alias, n_envs=2, n_steps=80, seed=seed)


@pytest.mark.slow
@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**20),
    alias=st.sampled_from(ALL_ALIASES),
    n_steps=st.sampled_from([25, 50, 120, 220]),
)
def test_all_env_parity_fuzz_deep(seed, alias, n_steps):
    """Every registered alias, fuzzed seed AND trajectory length (bucketed
    lengths bound the jit-shape cache)."""
    check_trajectory_parity(alias, n_envs=2, n_steps=n_steps, seed=seed)


@pytest.mark.slow
@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 2**20),
    alias=st.sampled_from(ALL_ALIASES),
    n_steps=st.sampled_from([15, 40, 70]),
)
def test_all_env_board_parity_fuzz(seed, alias, n_steps):
    """Rendered char boards agree step-for-step under fuzzed seeds/lengths
    (catches render-table drift the reward stream wouldn't)."""
    check_board_parity(alias, n_envs=2, n_steps=n_steps, seed=seed)
