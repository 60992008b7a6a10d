"""Property-based parity fuzzing (SURVEY.md §4 item 2: hypothesis over
random seeds and action sequences). Complements the fixed-seed parity suite
with randomized stress across the stochastic envs."""
from hypothesis import given, settings
from hypothesis import strategies as st

from parity_utils import check_trajectory_parity

STOCHASTIC = ["whisky", "absent", "interrupt", "tomato"]
DETERMINISTIC = ["sokoban", "boat", "conveyor", "foe"]


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
