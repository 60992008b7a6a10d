"""Training-throughput benchmark: fused train-chunk env-steps/s on one chip.

Measures the FULL actor-learner loop (act → env step → learn, including
replay writes/samples or GAE+minibatch epochs) for each agent family at
north-star scale (4096 envs). Not the driver headline (that's bench.py);
results are recorded in PERF.md.

Fencing note (same hardening as bench.py): on the axon platform
``block_until_ready`` is an async acknowledgement, NOT a completion fence —
every timed dispatch here ends in a scalar ``device_get`` (float()), which
cannot return before the device produced the value. Statistic: median of
N_WINDOWS independent ≥1 s windows.

Usage: python bench_train.py [--n-envs 4096] [--chunk 256]
"""
import argparse
import statistics
import time

import jax

N_WINDOWS = 3
WINDOW_SECONDS = 1.0


def measure(trainer, chunk_steps: int, warmup=None):
    astate, vstate = trainer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    if warmup is not None:
        astate, vstate, _ = jax.jit(trainer.warmup_chunk, static_argnums=3)(
            astate, vstate, key, warmup
        )
    chunk = jax.jit(trainer.train_chunk, static_argnums=3)
    # Compile + warm the tunnel; fence with a real host transfer.
    out = chunk(astate, vstate, key, chunk_steps)
    float(out[2].episodes)
    astate, vstate = out[0], out[1]

    n_envs = trainer.vec.n_envs
    windows = []
    for _ in range(N_WINDOWS):
        total = 0
        t0 = time.perf_counter()
        while True:
            key, k = jax.random.split(key)
            out = chunk(astate, vstate, k, chunk_steps)
            astate, vstate = out[0], out[1]
            total += chunk_steps * n_envs
            float(out[2].episodes)  # device_get: the only real fence on axon
            dt = time.perf_counter() - t0
            if dt >= WINDOW_SECONDS:
                break
        windows.append(total / dt)
    return statistics.median(windows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-envs", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--only", type=str, default=None,
                    help="measure only rows whose label contains this "
                         "substring (e.g. 'ppo-cnn', '[mxu')")
    args = ap.parse_args()

    from safe_grid_agents_tpu.agents.dqn import DQNAgent
    from safe_grid_agents_tpu.agents.ppo import PPOAgent
    from safe_grid_agents_tpu.agents.tabular import TabularQAgent
    from safe_grid_agents_tpu.envs import make_env
    from safe_grid_agents_tpu.envs.vec import VecEnv
    from safe_grid_agents_tpu.training.dqn import DQNTrainer
    from safe_grid_agents_tpu.training.ppo import PPOTrainer
    from safe_grid_agents_tpu.training.tabular import TabularQTrainer

    n, c = args.n_envs, args.chunk

    def report(name, rate):
        print(f"{name:28s} {rate/1e6:10.1f} M env-steps/s")

    def sel(label):
        return args.only is None or args.only in label

    for compiled in (False, True):
        tag = "compiled" if compiled else "base"
        if sel(f"tabular-q/shift [{tag}]"):
            env = make_env("shift", compiled=compiled)
            rate = measure(
                TabularQTrainer(TabularQAgent(env), VecEnv(env, n)), c
            )
            report(f"tabular-q/shift [{tag}]", rate)

    # Index-native tabular trainer on the MXU fused engine (--mxu).
    from safe_grid_agents_tpu.envs.mxu import MXUVecEnv
    from safe_grid_agents_tpu.training.tabular_mxu import MXUTabularQTrainer

    if sel("tabular-q/shift [mxu]") or sel("tabular-q/shift [mxu, K=8]"):
        env = make_env("shift", compiled=True)
        tab_mxu = MXUTabularQTrainer(TabularQAgent(env), MXUVecEnv(env, n))
        if sel("tabular-q/shift [mxu]"):
            rate = measure(tab_mxu, c)
            report("tabular-q/shift [mxu]", rate)
        if sel("tabular-q/shift [mxu, K=8]"):
            rate = measure_superchunk(tab_mxu, c, k_chunks=8, has_loss=False)
            report("tabular-q/shift [mxu, K=8]", rate)

    # Fused pallas tabular training kernel (round 4): the whole
    # act→step→learn loop inside one kernel per chunk.
    from safe_grid_agents_tpu.training.tabular_pallas import (
        PallasTabularQTrainer,
    )

    if (sel("tabular-q/shift [kernel]")
            or sel("tabular-q/shift [kernel, T=8192]")
            or sel("tabular-q/shift [kernel, T=32768]")):
        env = make_env("shift", compiled=True)
        tab_k = PallasTabularQTrainer(TabularQAgent(env), MXUVecEnv(env, n))
        if sel("tabular-q/shift [kernel]"):
            rate = measure(tab_k, c)
            report("tabular-q/shift [kernel]", rate)
        if sel("tabular-q/shift [kernel, T=8192]"):
            rate = measure(tab_k, 8192)
            report("tabular-q/shift [kernel, T=8192]", rate)
        if sel("tabular-q/shift [kernel, T=32768]"):
            rate = measure(tab_k, 32768)
            report("tabular-q/shift [kernel, T=32768]", rate)

    # Stochastic fused tabular training kernel (round 5): whisky's noise +
    # the TD loop in one kernel (ops/tabular_stoch_kernel.py).
    if sel("tabular-q/whisky [kernel, T=8192]"):
        env = make_env("whisky", compiled=True)
        tab_s = PallasTabularQTrainer(TabularQAgent(env), MXUVecEnv(env, n))
        rate = measure(tab_s, 8192)
        report("tabular-q/whisky [kernel, T=8192]", rate)
    if sel("tabular-q/whisky [mxu]"):
        env = make_env("whisky", compiled=True)
        rate = measure(
            MXUTabularQTrainer(TabularQAgent(env), MXUVecEnv(env, n)), c
        )
        report("tabular-q/whisky [mxu]", rate)

    # Round-5 closing: tomato's drying in-kernel (index bit-clears,
    # ops/stoch_rollout_kernel.py module doc) — the last fused exclusion.
    # tomato's S_pad=1344 caps the single-lane-block tabular kernel at
    # N=512 (3·S_pad·N·4 ≤ 12 MB VMEM guard), so both trainers run at 512
    # lanes for the like-for-like ratio.
    if sel("tabular-q/tomato [kernel, N=512, T=8192]"):
        env = make_env("tomato", compiled=True)
        tab_t = PallasTabularQTrainer(
            TabularQAgent(env), MXUVecEnv(env, 512)
        )
        rate = measure(tab_t, 8192)
        report("tabular-q/tomato [kernel, N=512, T=8192]", rate)
    if sel("tabular-q/tomato [mxu, N=512]"):
        env = make_env("tomato", compiled=True)
        rate = measure(
            MXUTabularQTrainer(TabularQAgent(env), MXUVecEnv(env, 512)), c
        )
        report("tabular-q/tomato [mxu, N=512]", rate)

    if sel("deep-q/sokoban [compiled]"):
        env = make_env("sokoban", compiled=True)
        rate = measure(
            DQNTrainer(
                DQNAgent(env, replay_capacity=1 << 20, batch_size=1024),
                VecEnv(env, n),
                updates_per_chunk=max(1, c // 8),
            ),
            c,
            warmup=16,
        )
        report("deep-q/sokoban [compiled]", rate)

    from safe_grid_agents_tpu.training.dqn_mxu import MXUDQNTrainer

    if sel("deep-q/sokoban [mxu]") or sel("deep-q/sokoban [mxu, K=8]"):
        env = make_env("sokoban", compiled=True)
        dqn_mxu = MXUDQNTrainer(
            DQNAgent(env, replay_capacity=1 << 20, batch_size=1024),
            MXUVecEnv(env, n),
            updates_per_chunk=max(1, c // 8),
        )
        if sel("deep-q/sokoban [mxu]"):
            rate = measure(dqn_mxu, c, warmup=16)
            report("deep-q/sokoban [mxu]", rate)
        if sel("deep-q/sokoban [mxu, K=8]"):
            rate = measure_superchunk(dqn_mxu, c, k_chunks=8, warmup=16)
            report("deep-q/sokoban [mxu, K=8]", rate)

    # Fused pallas DQN collect kernel (round 5): the T-step collect loop in
    # one kernel, XLA update phase unchanged (ops/dqn_kernel.py).
    from safe_grid_agents_tpu.training.dqn_pallas import PallasDQNTrainer

    if (sel("deep-q/sokoban [kernel]") or sel("deep-q/sokoban [kernel, K=8]")
            or sel("deep-q/sokoban [kernel, T=2048]")):
        env = make_env("sokoban", compiled=True)
        dqn_k = PallasDQNTrainer(
            DQNAgent(env, replay_capacity=1 << 20, batch_size=1024),
            MXUVecEnv(env, n),
            updates_per_chunk=max(1, c // 8),
        )
        if sel("deep-q/sokoban [kernel]"):
            rate = measure(dqn_k, c, warmup=16)
            report("deep-q/sokoban [kernel]", rate)
        if sel("deep-q/sokoban [kernel, K=8]"):
            rate = measure_superchunk(dqn_k, c, k_chunks=8, warmup=16)
            report("deep-q/sokoban [kernel, K=8]", rate)
        if sel("deep-q/sokoban [kernel, T=2048]"):
            # Same U/T ratio as the 256-step row (updates_per_chunk scales
            # with c), amortizing the per-chunk launch+update overheads.
            dqn_k2 = PallasDQNTrainer(
                DQNAgent(env, replay_capacity=1 << 20, batch_size=1024),
                MXUVecEnv(env, n),
                updates_per_chunk=max(1, 2048 // 8),
            )
            rate = measure(dqn_k2, 2048, warmup=16)
            report("deep-q/sokoban [kernel, T=2048]", rate)

    for net in ("mlp", "cnn", "pallas", "table"):
        if sel(f"ppo-{net}/island [compiled]"):
            env = make_env("island", compiled=True)
            rate = measure(
                PPOTrainer(PPOAgent(env, net=net), VecEnv(env, n)), min(c, 64)
            )
            report(f"ppo-{net}/island [compiled]", rate)

    # MXU-PPO (round 3): index-native collect + tile-shuffled fast optimize.
    from safe_grid_agents_tpu.training.ppo_mxu import MXUPPOTrainer

    # ppo-cnn on the MXU engine (round 4, VERDICT r3 weak #1): index-native
    # collect; the conv trunk renders per-minibatch via the obs-table gather.
    if sel("ppo-cnn/island [mxu]"):
        env = make_env("island", compiled=True)
        trainer = MXUPPOTrainer(
            PPOAgent(env, net="cnn"), MXUVecEnv(env, n), mode="fast"
        )
        rate = measure(trainer, min(c, 64))
        report("ppo-cnn/island [mxu]", rate)

    # Fused pallas PPO optimize kernel (round 5): the whole epochs ×
    # minibatches update phase in one kernel (ops/ppo_kernel.py).
    from safe_grid_agents_tpu.training.ppo_pallas import PallasPPOTrainer

    if sel("ppo-table/island [kernel]") or sel("ppo-table/island [kernel, K=16]"):
        env = make_env("island", compiled=True)
        ppo_k = PallasPPOTrainer(
            PPOAgent(env, net="table"), MXUVecEnv(env, n)
        )
        if sel("ppo-table/island [kernel]"):
            rate = measure(ppo_k, min(c, 64))
            report("ppo-table/island [kernel]", rate)
        if sel("ppo-table/island [kernel, K=16]"):
            rate = measure_superchunk(ppo_k, min(c, 64), k_chunks=16)
            report("ppo-table/island [kernel, K=16]", rate)

    if sel("ppo-table/island [mxu]") or sel("ppo-table/island [mxu, K=16]"):
        env = make_env("island", compiled=True)
        trainer = MXUPPOTrainer(
            PPOAgent(env, net="table"), MXUVecEnv(env, n), mode="fast"
        )
        if sel("ppo-table/island [mxu]"):
            rate = measure(trainer, min(c, 64))
            report("ppo-table/island [mxu]", rate)

        # Dispatch-amortized: K chunks scanned in one jit (the CLI's
        # --chunks-per-dispatch; one ~25-30 ms tunnel round-trip per K chunks).
        if sel("ppo-table/island [mxu, K=16]"):
            rate = measure_superchunk(trainer, min(c, 64), k_chunks=16)
            report("ppo-table/island [mxu, K=16]", rate)

    # Round-5 closing: stochastic aliases through BOTH fused PPO kernels
    # (ops/ppo_stoch_collect_kernel.py collect + ops/ppo_kernel.py
    # optimize) vs the XLA fast path.
    if sel("ppo-table/absent [kernel, K=16]"):
        env = make_env("absent", compiled=True)
        ppo_s = PallasPPOTrainer(
            PPOAgent(env, net="table"), MXUVecEnv(env, n)
        )
        rate = measure_superchunk(ppo_s, min(c, 64), k_chunks=16)
        report("ppo-table/absent [kernel, K=16]", rate)
    if sel("ppo-table/absent [mxu, K=16]"):
        env = make_env("absent", compiled=True)
        trainer = MXUPPOTrainer(
            PPOAgent(env, net="table"), MXUVecEnv(env, n), mode="fast"
        )
        rate = measure_superchunk(trainer, min(c, 64), k_chunks=16)
        report("ppo-table/absent [mxu, K=16]", rate)


def measure_superchunk(trainer, chunk_steps: int, k_chunks: int,
                       has_loss: bool = True, warmup=None):
    """K train_chunks scanned inside one jitted dispatch, fenced once."""
    import jax.numpy as jnp  # noqa: F401

    astate, vstate = trainer.init(jax.random.PRNGKey(0))
    if warmup is not None:
        astate, vstate, _ = jax.jit(trainer.warmup_chunk, static_argnums=3)(
            astate, vstate, jax.random.PRNGKey(9), warmup
        )

    def multi(astate, vstate, key):
        def body(carry, _):
            a, v, k = carry
            k, kc = jax.random.split(k)
            out = trainer.train_chunk(a, v, kc, chunk_steps)
            y = out[3] if has_loss else out[2].episodes
            return (out[0], out[1], k), y

        (astate, vstate, _), losses = jax.lax.scan(
            body, (astate, vstate, key), None, length=k_chunks
        )
        return astate, vstate, losses.mean()

    multi = jax.jit(multi)
    key = jax.random.PRNGKey(1)
    astate, vstate, loss = multi(astate, vstate, key)
    float(loss)

    n_envs = trainer.vec.n_envs
    windows = []
    for _ in range(N_WINDOWS):
        total = 0
        t0 = time.perf_counter()
        while True:
            key, k = jax.random.split(key)
            astate, vstate, loss = multi(astate, vstate, k)
            total += chunk_steps * n_envs * k_chunks
            float(loss)  # device_get fence
            dt = time.perf_counter() - t0
            if dt >= WINDOW_SECONDS:
                break
        windows.append(total / dt)
    return statistics.median(windows)


if __name__ == "__main__":
    main()
