"""Engine/oracle parity across the full env suite (SURVEY.md §4 item 2)."""
import pytest

from parity_utils import check_board_parity, check_trajectory_parity

ALIASES = [
    "sokoban2",
    "boat",
    "tomato",
    "whisky",
    "absent",
    "interrupt",
    "conveyor",
    "conveyor-sushi",
    "friend",
    "foe",
    "neutral",
    "corners",
    "way",
    "toy",
]


@pytest.mark.parametrize("alias", ALIASES)
def test_trajectory_parity(alias):
    check_trajectory_parity(alias, n_envs=4, n_steps=150)


@pytest.mark.parametrize("alias", ALIASES)
def test_board_parity(alias):
    check_board_parity(alias, n_envs=2, n_steps=40)
