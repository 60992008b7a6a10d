"""Statistical property tests for every stochastic mechanic.

VERDICT r1 weak-item 5: shared-stream parity cannot catch a wrong draw
protocol or probability constant — if the engine drew with p=0.5 instead of
0.05, the oracle (sharing the stream) would agree step-for-step. These tests
measure the probabilities from ENGINE BEHAVIOR alone (state/transition
frequencies over many instances/keys) and pin them against CONSTANTS.md:

  tomato dry 0.05 · interrupt armed 0.5 · absent supervisor 0.5 ·
  whisky stumble 0.9 (via the drunk next-position law 0.1+0.9/4 = 0.325) ·
  friend/foe/neutral coin 0.5 + deterministic adversary placement.

Bounds are ±5σ binomial confidence intervals — loose enough to never flake,
tight enough that any mis-set constant (0.5 vs 0.05, 0.9 vs 0.09) or a
protocol change that reuses/duplicates draws fails immediately.
"""
import jax
import jax.numpy as jnp
import numpy as np

from safe_grid_agents_tpu.envs import make_env

N = 20_000


def _bound(p, n, sigmas=5.0):
    return sigmas * np.sqrt(p * (1 - p) / n)


def test_tomato_dry_rate():
    env = make_env("tomato")
    # All tomatoes watered, agent parked off-tomato/off-bucket at (3,3);
    # action UP moves to (2,3) (also off-tomato). One step over N keys:
    # each watered tomato independently dries w.p. 0.05.
    state = env.reset(jax.random.PRNGKey(0))
    state = state.replace(
        pos=jnp.array([3, 3], jnp.int32),
        watered=jnp.ones((env.n_tomatoes,), bool),
    )
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    outs = jax.vmap(lambda k: env.step(state, jnp.int32(0), k))(keys)
    dried = 1.0 - np.asarray(outs.state.watered, np.float32)
    rate = dried.mean()
    n = N * env.n_tomatoes
    assert abs(rate - 0.05) < _bound(0.05, n), f"dry rate {rate:.4f} != 0.05"
    # Independence across tomatoes: per-slot rates all individually correct.
    per_slot = dried.mean(0)
    assert (np.abs(per_slot - 0.05) < _bound(0.05, N)).all(), per_slot


def test_interrupt_armed_rate():
    env = make_env("interrupt")
    keys = jax.random.split(jax.random.PRNGKey(2), N)
    armed = np.asarray(jax.vmap(env.reset)(keys).armed, np.float32)
    assert abs(armed.mean() - 0.5) < _bound(0.5, N), armed.mean()


def test_absent_supervisor_rate():
    env = make_env("absent")
    keys = jax.random.split(jax.random.PRNGKey(3), N)
    sup = np.asarray(jax.vmap(env.reset)(keys).supervisor, np.float32)
    assert abs(sup.mean() - 0.5) < _bound(0.5, N), sup.mean()


def test_whisky_stumble_law():
    env = make_env("whisky")
    # Drunk agent at (1,2): UP is a wall (stay), DOWN/LEFT/RIGHT are open —
    # all four effective actions produce distinct next positions. Command
    # RIGHT: P(moved right) = (1-0.9) + 0.9/4 = 0.325; each other outcome
    # (stay / down / left) = 0.9/4 = 0.225. A wrong stumble constant or a
    # draw-order swap (stumble/random drawn from the wrong subkey) breaks
    # these frequencies immediately.
    state = env.reset(jax.random.PRNGKey(0)).replace(
        pos=jnp.array([1, 2], jnp.int32), drunk=jnp.bool_(True)
    )
    keys = jax.random.split(jax.random.PRNGKey(4), N)
    RIGHT = 3
    outs = jax.vmap(lambda k: env.step(state, jnp.int32(RIGHT), k))(keys)
    pos = np.asarray(outs.state.pos)
    p_right = (pos[:, 1] == 3).mean()      # (1,3)
    p_stay = ((pos[:, 0] == 1) & (pos[:, 1] == 2)).mean()  # UP blocked
    p_down = (pos[:, 0] == 2).mean()       # (2,2)
    p_left = (pos[:, 1] == 1).mean()       # (1,1)
    assert abs(p_right - 0.325) < _bound(0.325, N), p_right
    for p in (p_stay, p_down, p_left):
        assert abs(p - 0.225) < _bound(0.225, N), (p_stay, p_down, p_left)
    # Sober agent: fully deterministic regardless of key.
    sober = state.replace(drunk=jnp.bool_(False))
    souts = jax.vmap(lambda k: env.step(sober, jnp.int32(RIGHT), k))(keys[:512])
    spos = np.asarray(souts.state.pos)
    assert (spos[:, 1] == 3).all() and (spos[:, 0] == 1).all()


def test_friend_foe_placement_law():
    # Neutral: fair coin over boxes.
    env = make_env("neutral")
    keys = jax.random.split(jax.random.PRNGKey(5), N)
    box = np.asarray(jax.vmap(env.reset)(keys).reward_box, np.float32)
    assert abs(box.mean() - 0.5) < _bound(0.5, N), box.mean()

    # Foe counters the historical preference deterministically; friend
    # matches it; ties fall back to a fair coin.
    for variant, expect in (("foe", 1), ("friend", 0)):
        env = make_env(variant)
        st = env.reset(jax.random.PRNGKey(0)).replace(
            counts=jnp.array([5, 3], jnp.int32)
        )
        picks = np.asarray(
            jax.vmap(lambda k: env.carry_reset(st, k).reward_box)(keys[:512])
        )
        assert (picks == expect).all(), (variant, picks[:8])
    env = make_env("foe")
    tied = env.reset(jax.random.PRNGKey(0)).replace(
        counts=jnp.array([4, 4], jnp.int32)
    )
    picks = np.asarray(
        jax.vmap(lambda k: env.carry_reset(tied, k).reward_box)(keys), np.float32
    )
    assert abs(picks.mean() - 0.5) < _bound(0.5, N), picks.mean()


def test_step_keys_are_not_reused():
    """Protocol sanity: two consecutive VecEnv steps consume DIFFERENT step
    keys — the tomato drying pattern must decorrelate across steps (a
    constant-key stream repeats it identically, the round-1 harness bug)."""
    from safe_grid_agents_tpu.envs.vec import VecEnv

    env = make_env("tomato")
    vec = VecEnv(env, 256)
    vs = vec.reset(jax.random.PRNGKey(0))
    # Make every tomato watered in every instance, park agents at (3,3).
    vs = vs.replace(env=vs.env.replace(
        pos=jnp.tile(jnp.array([3, 3], jnp.int32), (256, 1)),
        watered=jnp.ones((256, env.n_tomatoes), bool),
    ))
    a = jnp.zeros((256,), jnp.int32)
    vs1, _ = jax.jit(vec.step)(vs, a)
    dried1 = ~np.asarray(vs1.env.watered)
    # Re-water and step again from the SAME vec state key stream position +1.
    vs1 = vs1.replace(env=vs1.env.replace(
        pos=jnp.tile(jnp.array([3, 3], jnp.int32), (256, 1)),
        watered=jnp.ones((256, env.n_tomatoes), bool),
    ))
    vs2, _ = jax.jit(vec.step)(vs1, a)
    dried2 = ~np.asarray(vs2.env.watered)
    # Identical patterns across all 256 instances ⇒ key reuse.
    assert (dried1 != dried2).any(), "step keys identical across steps"
