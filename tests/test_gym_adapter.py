"""Gym-style adapter + rendering + bitwise-resume guarantee."""
import jax
import numpy as np

from safe_grid_agents_tpu.agents.tabular import TabularQAgent
from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.gym_adapter import GymEnv
from safe_grid_agents_tpu.envs.vec import VecEnv
from safe_grid_agents_tpu.training.tabular import TabularQTrainer
from safe_grid_agents_tpu.utils import checkpoint as ckpt
from safe_grid_agents_tpu.utils.render import to_ansi, to_rgb


def test_gym_adapter_episode():
    env = GymEnv("shift")
    obs = env.reset(seed=0)
    assert obs.shape == (4, 7, 9)
    total, hidden_total = 0.0, 0.0
    # Golden goal path: DOWN DOWN RIGHT×6 UP UP.
    for a in [1, 1, 3, 3, 3, 3, 3, 3, 0, 0]:
        obs, r, done, info = env.step(a)
        total += r
    assert done and total == 40.0
    assert info["hidden_return"] == 40.0
    assert env.get_last_performance() == 40.0


def test_gym_adapter_hidden_info():
    env = GymEnv("island")
    env.reset(seed=0)
    obs, r, done, info = env.step(0)  # UP into water
    assert done and r == -1.0
    assert info["hidden_reward"] == -51.0
    assert bool(info["on_water"])


def test_render_modes():
    env = GymEnv("sokoban")
    env.reset(seed=0)
    text = env.render(mode="ansi")
    assert text.splitlines()[0] == "######"
    assert "A" in text and "X" in text and "G" in text
    img = env.render(mode="rgb_array")
    assert img.shape == (6 * 8, 6 * 8, 3) and img.dtype == np.uint8


def test_ansi_roundtrip_matches_art():
    from safe_grid_agents_tpu.envs.sokoban import ART

    env = make_env("sokoban")
    board = np.asarray(env.board(env.reset(jax.random.PRNGKey(0))))
    assert to_ansi(board) == "\n".join(ART)


def test_bitwise_resume(tmp_path):
    """A checkpointed-and-restored run must continue bit-for-bit identically
    to an uninterrupted one (SURVEY.md §5 checkpoint/resume requirement)."""
    env = make_env("shift")
    vec = VecEnv(env, 32)
    agent = TabularQAgent(env, lr=0.2)
    tr = TabularQTrainer(agent, vec)
    chunk = jax.jit(tr.train_chunk, static_argnums=3)

    def advance(astate, vstate, key, n):
        for _ in range(n):
            key, k = jax.random.split(key)
            astate, vstate, _ = chunk(astate, vstate, k, 64)
        return astate, vstate, key

    # Uninterrupted: 4 chunks.
    a0, v0 = tr.init(jax.random.PRNGKey(0))
    a_ref, v_ref, _ = advance(a0, v0, jax.random.PRNGKey(1), 4)

    # Interrupted: 2 chunks → checkpoint → restore → 2 chunks.
    a1, v1 = tr.init(jax.random.PRNGKey(0))
    a1, v1, key1 = advance(a1, v1, jax.random.PRNGKey(1), 2)
    ckpt.save(str(tmp_path / "ck"), 2, (a1, v1, key1))
    a2, v2, key2 = ckpt.restore(str(tmp_path / "ck"), (a1, v1, key1))
    a_res, v_res, _ = advance(a2, v2, key2, 2)

    np.testing.assert_array_equal(np.asarray(a_ref.q), np.asarray(a_res.q))
    for l_ref, l_res in zip(jax.tree.leaves(v_ref), jax.tree.leaves(v_res)):
        np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_res))


def test_get_last_performance_survives_reset():
    """Regression: the reference's episode loop reads performance AFTER
    reset; it must return the last completed episode's hidden sum."""
    env = GymEnv("island")
    env.reset(seed=0)
    _, _, done, _ = env.step(0)  # UP into water: hidden −51, terminal
    assert done
    env.reset()
    assert env.get_last_performance() == -51.0


def test_adapter_documented_surface():
    """Conformance: the safe-grid-gym-documented method/space/info surface
    (SURVEY.md §2b gym wrapper row; VERDICT r1 item 10), so reference
    experiment scripts port 1:1."""
    from safe_grid_agents_tpu.envs.gym_adapter import GYM_ID_REGISTRY, make

    env = make("IslandNavigation-v0")  # registration-style id
    assert env.env.name == "island_navigation"
    # Classic seeding API.
    assert env.seed(7) == [7]
    obs = env.reset()
    assert obs.shape == env.observation_space.shape
    assert env.observation_space.dtype == np.float32
    # Spaces: Discrete-like action space with n/sample/contains.
    assert env.action_space.n == 4
    a = env.action_space.sample()
    assert env.action_space.contains(a)
    # Documented info keys.
    _, r, _, info = env.step(3)
    for key in ("hidden_reward", "observed_reward", "hidden_return"):
        assert key in info, info.keys()
    assert info["observed_reward"] == r
    # Classic teardown + unwrapped.
    assert env.unwrapped is env
    env.close()
    # seed() → reset() is reproducible (same stream as reset(seed=...)).
    env.seed(3)
    o1 = env.reset()
    o2 = env.reset(seed=3)
    np.testing.assert_array_equal(o1, o2)
    # Every registered id constructs.
    for gym_id in GYM_ID_REGISTRY:
        make(gym_id)
