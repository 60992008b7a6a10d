"""Bounded-memory friend_foe under the compiled engine (VERDICT r2 #6).

The bounded adversary (envs/friend_foe.py::BoundedFriendFoe) tracks the
clamped choice imbalance d = counts[0] − counts[1] instead of unbounded
counts; placement reads only sign(d), so within the cap window it is the
EXACT reference dynamics. These tests pin: the bitwise window vs the
unbounded array engine, the clamp semantics at the bound, adversary
adaptivity surviving compilation, and (round 4) MXU eligibility via the
carried-state reset with the tabular index-leak exclusion kept loud.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safe_grid_agents_tpu.envs import make_env
from safe_grid_agents_tpu.envs.friend_foe import BoundedFriendFoe, FriendFoe
from safe_grid_agents_tpu.envs.vec import VecEnv


@pytest.mark.parametrize("variant", ["friend", "foe", "neutral"])
def test_bounded_bitwise_window(variant):
    """Unbounded array engine ≡ bounded env over any run whose per-instance
    choice count stays under the cap (one choice costs ≥4 steps here, so
    400 steps ⇒ ≤100 choices < 127)."""
    base = FriendFoe(variant)
    bounded = BoundedFriendFoe(variant, cap=127)
    n, t = 8, 400
    vb, vc = VecEnv(base, n), VecEnv(bounded, n)
    key = jax.random.PRNGKey(0)
    sb, sc = vb.reset(key), vc.reset(key)
    acts = jax.random.randint(jax.random.PRNGKey(9), (t, n), 0, 4)
    _, ob = jax.jit(vb.run_actions)(sb, acts)
    _, oc = jax.jit(vc.run_actions)(sc, acts)
    for field in ("reward", "hidden_reward", "done", "finished_return"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ob, field)), np.asarray(getattr(oc, field)),
            err_msg=f"{variant}.{field}",
        )


@pytest.mark.parametrize("variant", ["friend", "foe"])
def test_compiled_friend_matches_bounded_engine(variant):
    """The compiled lookup-table execution of the bounded env is bitwise-
    equal to the bounded array engine (the standard compiled-engine
    contract, now covering the friend family)."""
    bounded = BoundedFriendFoe(variant, cap=127)
    comp = make_env(variant, compiled=True)
    assert comp.base.cap == 127
    n, t = 8, 200
    vb, vc = VecEnv(bounded, n), VecEnv(comp, n)
    key = jax.random.PRNGKey(3)
    sb, sc = vb.reset(key), vc.reset(key)
    acts = jax.random.randint(jax.random.PRNGKey(4), (t, n), 0, 4)
    _, ob = jax.jit(vb.run_actions)(sb, acts)
    _, oc = jax.jit(vc.run_actions)(sc, acts)
    for field in ("reward", "hidden_reward", "done"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ob, field)), np.asarray(getattr(oc, field)),
            err_msg=f"{variant}.{field}",
        )


def test_clamp_semantics_at_bound():
    env = BoundedFriendFoe("friend", cap=5)
    st = env.reset(jax.random.PRNGKey(0))
    st = st.replace(d=jnp.int32(5), pos=jnp.asarray(env.boxes[0]))
    # Standing on box0 and pressing into the wall re-chooses box0: the
    # unbounded d would grow to 6; the bounded d stays clamped at the cap.
    out = env.step(st, jnp.int32(0), jax.random.PRNGKey(1))
    assert int(out.state.d) == 5
    # And the index stays in range at the bound.
    assert 0 <= int(env.state_index(out.state)) < env.num_states


def test_compiled_foe_adversary_adapts():
    """Behavioral check that compilation preserved adaptivity: against a
    policy that always walks to box0, the foe places the reward in box1
    (win only on the first tie-coin episodes), while neutral wins ~half."""
    def run(alias, seed=0, episodes=40):
        comp = make_env(alias, compiled=True)
        env = comp
        st = env.reset(jax.random.PRNGKey(seed))
        key = jax.random.PRNGKey(seed + 1)
        wins = []
        # Policy: up twice, left twice → box0 at (1,1) from start (3,3).
        for _ in range(episodes):
            for a in (0, 0, 2, 2):  # UP, UP, LEFT, LEFT
                key, k = jax.random.split(key)
                out = env.step(st, jnp.int32(a), k)
                st = out.state
                if bool(out.done):
                    wins.append(bool(out.info["won"]))
                    key, kr = jax.random.split(key)
                    st = env.carry_reset(st, kr)
                    break
        return np.mean(wins)

    assert run("foe") < 0.2      # adversary routes the reward away
    assert 0.25 < run("neutral") < 0.75


def test_friend_mxu_eligible_but_tabular_rejected():
    """Round 4: the friend family rides the MXU engine via the carried-state
    reset (bitwise parity in tests/test_mxu.py). Index-KEYED tabular Q stays
    excluded — the compiled index encodes the hidden reward box, so the CLI
    must reject it loudly on BOTH compiled paths."""
    from safe_grid_agents_tpu.cli.main import run
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv

    comp = make_env("friend", compiled=True, cap=15)
    mxu = MXUVecEnv(comp, 4)
    assert mxu._carried_reset
    for flags in (["--compiled"], ["--compiled", "--mxu"]):
        with pytest.raises(SystemExit, match="hidden"):
            run(["friend", "tabular-q", *flags,
                 "--n-envs", "4", "--steps", "64"])
