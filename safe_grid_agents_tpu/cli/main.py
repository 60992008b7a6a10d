"""Experiment driver (reference main.py, SURVEY.md §2a #1 / §3.1):
parse → build env/agent/trainer → warmup → chunked train loop with periodic
eval + metrics + checkpoints → final eval. The hot loop is entirely on
device; this file only orchestrates chunks and logs.
"""
from __future__ import annotations

import jax
import numpy as np

from ..agents import make_agent
from ..envs import make_env
from ..envs.vec import VecEnv
from ..parallel import DPTrainer, GSPMDTrainer, make_mesh
from ..training import make_trainer, stats_to_host
from ..utils import checkpoint as ckpt
from ..utils.meters import MetricsLogger
from .parsing import agent_kwargs, apply_preset, prepare_parser


def run(argv=None) -> dict:
    args = prepare_parser().parse_args(argv)
    if args.preset:
        import sys

        args = apply_preset(args, argv if argv is not None else sys.argv[1:])

    if args.platform:
        # Must precede any device query (CLAUDE.md: env vars are consumed
        # before user code here; the config route is the reliable one).
        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu" and args.n_devices > 1:
            # Virtual CPU devices so multi-device meshes work off-TPU.
            jax.config.update("jax_num_cpu_devices", args.n_devices)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # Join a multi-host cluster when cluster env vars are present (no-op for
    # single-process runs) — must precede any device query.
    from ..parallel.multihost import ensure_initialized

    ensure_initialized()

    env = make_env(args.env, compiled=args.compiled)
    if args.agent == "tabular-q" and args.compiled and args.env in (
        "friend", "foe", "neutral"
    ):
        # Index leak: the bounded friend family's compiled state index
        # encodes the HIDDEN reward box + the adversary's memory, and
        # tabular Q keys its table by that index (envs/friend_foe.py
        # BoundedFriendFoe docstring). The array engine's index is pos-only.
        raise SystemExit(
            "tabular-q on the compiled friend family reads the hidden "
            "reward box through its state index — run it on the array "
            "engine (drop --compiled/--mxu)"
        )
    if getattr(args, "fused_kernel", False) and not getattr(args, "mxu", False):
        # Without this the flag would be silently ignored (it is only
        # consulted inside the --mxu branch) — fail loudly instead.
        raise SystemExit("--fused-kernel requires --compiled --mxu")
    if getattr(args, "mxu", False):
        # MXU fused-engine trainers: tabular's act/learn is index-native
        # (the whole loop becomes matmuls); deep-q keeps its agent unchanged
        # and rides the MXU engine for collect with TableState replay
        # records; the PPO family collects index-native rollouts and runs
        # the fast optimize layout (training/ppo_mxu.py).
        mxu_agents = ("tabular-q", "deep-q", "ppo-mlp", "ppo-cnn", "ppo-crmdp")
        if not args.compiled or args.agent not in mxu_agents:
            raise SystemExit(
                f"--mxu requires --compiled and one of {mxu_agents}"
            )
        from ..envs.mxu import MXUVecEnv

        vec = MXUVecEnv(env, args.n_envs)
        agent = make_agent(args.agent, env, **agent_kwargs(args))
        if args.agent == "tabular-q":
            if args.fused_kernel:
                if args.cheat or args.n_devices > 1:
                    raise SystemExit(
                        "--fused-kernel is single-device and trains on the "
                        "observed reward; drop --cheat/--n-devices"
                    )
                from ..training.tabular_pallas import PallasTabularQTrainer

                trainer = PallasTabularQTrainer(agent, vec)
            else:
                from ..training.tabular_mxu import MXUTabularQTrainer

                trainer = MXUTabularQTrainer(agent, vec, cheat=args.cheat)
        elif args.agent == "deep-q":
            if args.fused_kernel:
                if args.n_devices > 1:
                    raise SystemExit(
                        "--fused-kernel is single-device; drop --n-devices"
                    )
                from ..training.dqn_pallas import PallasDQNTrainer

                trainer = PallasDQNTrainer(
                    agent, vec, cheat=args.cheat,
                    updates_per_chunk=args.updates_per_chunk,
                )
            else:
                from ..training.dqn_mxu import MXUDQNTrainer

                trainer = MXUDQNTrainer(
                    agent, vec, cheat=args.cheat,
                    updates_per_chunk=args.updates_per_chunk,
                )
        elif args.agent == "ppo-crmdp":
            if args.fused_kernel:
                # Round-5 closing: CRMDP rides both fused PPO kernels —
                # the attribution/relabel runs between them unchanged.
                if args.n_devices > 1:
                    raise SystemExit(
                        "--fused-kernel is single-device; drop --n-devices"
                    )
                if not getattr(args, "table_net", False):
                    raise SystemExit(
                        "--fused-kernel ppo requires --table-net (the "
                        "optimize kernel folds the obs table into layer 1)"
                    )
                from ..training.ppo_pallas import PallasCRMDPTrainer

                trainer = PallasCRMDPTrainer(agent, vec)
            else:
                from ..training.ppo_mxu import MXUCRMDPTrainer

                mode = "parity" if args.mxu_parity else "fast"
                trainer = MXUCRMDPTrainer(agent, vec, mode=mode)
        elif args.fused_kernel:
            if args.n_devices > 1:
                raise SystemExit(
                    "--fused-kernel is single-device; drop --n-devices"
                )
            if not getattr(args, "table_net", False):
                raise SystemExit(
                    "--fused-kernel ppo requires --table-net (the optimize "
                    "kernel folds the obs table into layer 1)"
                )
            from ..training.ppo_pallas import PallasPPOTrainer

            trainer = PallasPPOTrainer(agent, vec, cheat=args.cheat)
        else:
            from ..training.ppo_mxu import MXUPPOTrainer

            mode = "parity" if args.mxu_parity else "fast"
            trainer = MXUPPOTrainer(agent, vec, cheat=args.cheat, mode=mode)
    else:
        vec = VecEnv(env, args.n_envs)
        agent = make_agent(args.agent, env, **agent_kwargs(args))

        trainer_kwargs = {}
        if args.agent == "deep-q":
            trainer_kwargs["updates_per_chunk"] = args.updates_per_chunk
        if args.agent != "ppo-crmdp":
            trainer_kwargs["cheat"] = args.cheat
        trainer = make_trainer(args.agent, agent, vec, **trainer_kwargs)

    if args.tp > 1:
        # dp×tp GSPMD runtime: dense layers shard over 'model', envs over
        # 'data' (parallel/tp.py). Deep agents only.
        assert args.agent in ("deep-q", "ppo-mlp", "ppo-cnn", "ppo-crmdp"), (
            f"--tp needs a deep agent, got {args.agent!r}"
        )
        if getattr(args, "mxu", False):
            # The GSPMD runtime's param-placement rules target the standard
            # flax Dense stacks; the MXU trainers' flat-vector optimizer
            # state and table-folded layer-1 param are not wired for the
            # 'model' axis. Fail loudly rather than run an unvalidated combo.
            raise SystemExit("--tp with --mxu is not supported; drop one")
        mesh = make_mesh(n_data=args.n_devices // args.tp, n_model=args.tp)
        trainer = GSPMDTrainer(trainer, mesh)
    elif args.n_devices > 1:
        mesh = make_mesh(n_data=args.n_devices)
        trainer = DPTrainer(trainer, mesh)

    logger = MetricsLogger(args.log_dir)
    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    astate, vstate = trainer.init(k_init)

    # --chunks-per-dispatch: scan K train chunks inside one jit so a whole
    # logging interval runs as a single device dispatch (the axon tunnel
    # costs ~25-30 ms per round-trip — at MXU-PPO speed that is more than a
    # 64-step chunk's entire device work; see PERF.md dispatch-amortization).
    K = args.chunks_per_dispatch
    if K > 1:
        def _multi_chunk(astate, vstate, key, n_steps):
            def body(carry, _):
                a, v, k = carry
                k, kc = jax.random.split(k)
                out = trainer.train_chunk(a, v, kc, n_steps)
                return (out[0], out[1], k), (out[2],) + tuple(out[3:])

            (astate, vstate, _), ys = jax.lax.scan(
                body, (astate, vstate, key), None, length=K
            )
            stats = jax.tree.map(lambda x: x.sum(0), ys[0])
            return (astate, vstate, stats) + tuple(y.mean(0) for y in ys[1:])

        chunk = jax.jit(_multi_chunk, static_argnums=3)
    else:
        chunk = jax.jit(trainer.train_chunk, static_argnums=3)

    # --eval-episodes: greedy eval runs until ≥E episodes finish (reference
    # SURVEY.md §2a #4). The step bound is sized so the target is always
    # reachable: every instance finishes ≥1 episode per env.max_steps steps
    # (timeout), so ceil(E/N)+1 timeout rounds suffice.
    min_eps = args.eval_episodes
    if min_eps:
        import math

        eval_steps = max(
            args.eval_steps,
            (math.ceil(min_eps / args.n_envs) + 1) * int(env.max_steps),
        )
    else:
        eval_steps = args.eval_steps

    if args.eval_env:
        # Distributional-shift protocol: greedy eval on a different layout.
        from ..training.common import eval_chunk as _generic_eval

        eval_env = make_env(args.eval_env, compiled=args.compiled)
        eval_vec = VecEnv(eval_env, args.n_envs)
        eval_agent = agent.for_env(eval_env)

        def _eval(astate, vstate, key, n_steps):
            del vstate  # fresh eval episodes on the eval layout
            k_reset, k_steps = jax.random.split(key)
            evs = eval_vec.reset(k_reset)
            return _generic_eval(
                eval_vec, eval_agent.act, astate, evs, k_steps, n_steps,
                min_episodes=min_eps,
            )

        echunk = jax.jit(_eval, static_argnums=3)
    else:
        # Evaluate from FRESH episodes: reusing the live training VecState
        # would mix exploration-policy partial episodes into eval stats.
        def _eval(astate, vstate, key, n_steps):
            del vstate
            k_reset, k_steps = jax.random.split(key)
            return trainer.eval_chunk(
                astate, trainer_reset(k_reset), k_steps, n_steps,
                min_episodes=min_eps,
            )

        if args.n_devices > 1:
            trainer_reset = trainer.reset_envs
        else:
            trainer_reset = trainer.vec.reset
        echunk = jax.jit(_eval, static_argnums=3)

    start_chunk = 0
    n_chunks = max(1, args.steps // (args.chunk_steps * args.n_envs * K))

    if args.checkpoint_dir and args.resume:
        step, state = ckpt.restore_latest_valid(
            args.checkpoint_dir, (astate, vstate, key)
        )
        if step is not None:
            astate, vstate, key = state
            start_chunk = step
            print(f"resumed from chunk {step}", flush=True)

    # Warmup (reference WARMUP_MAP: dqn fills its replay buffer, others noop).
    base_trainer = getattr(trainer, "trainer", trainer)  # unwrap DPTrainer
    has_warmup = hasattr(base_trainer, "warmup_chunk")
    if has_warmup and start_chunk == 0 and args.warmup_steps > 0:
        key, kw = jax.random.split(key)
        astate, vstate, _ = jax.jit(trainer.warmup_chunk, static_argnums=3)(
            astate, vstate, kw, args.warmup_steps
        )

    # Profiling window (SURVEY.md §5 tracing): trace a few chunks past the
    # compile, inside steady state (clamped into the run's actual range).
    profile_span = None
    if args.profile_dir:
        if "axon" in (jax.config.jax_platforms or ""):
            # The tunneled axon TPU platform hangs inside start_trace;
            # profiling works on cpu/tpu backends proper.
            print("--profile-dir: tracing unsupported on the axon tunnel; "
                  "skipping", flush=True)
        else:
            p0 = min(start_chunk + 1, n_chunks - 1)
            profile_span = (p0, min(p0 + 2, n_chunks - 1))

    env_steps = start_chunk * args.chunk_steps * args.n_envs * K
    final_stats = {}
    for i in range(start_chunk, n_chunks):
        if profile_span and i == profile_span[0]:
            jax.profiler.start_trace(args.profile_dir)
        key, k = jax.random.split(key)
        out = chunk(astate, vstate, k, args.chunk_steps)
        astate, vstate = out[0], out[1]
        stats = out[2]
        env_steps += args.chunk_steps * args.n_envs * K
        if profile_span and i == profile_span[1]:
            jax.block_until_ready(stats.episodes)
            jax.profiler.stop_trace()
            profile_span = None

        if (i + 1) % args.eval_every == 0 or i == n_chunks - 1:
            s = stats_to_host(stats)
            if len(out) > 3:
                s["loss"] = float(out[3])
            logger.log(env_steps, s, "train")
            key, ke = jax.random.split(key)
            _, es = echunk(astate, vstate, ke, eval_steps)
            final_stats = stats_to_host(es)
            logger.log(env_steps, final_stats, "eval")

        if args.checkpoint_dir and (i + 1) % args.checkpoint_every == 0:
            # Async save: training continues while orbax writes (SURVEY.md §5).
            ckpt.save(args.checkpoint_dir, i + 1, (astate, vstate, key), wait=False)

    if args.checkpoint_dir:
        ckpt.wait_all()
        ckpt.save(args.checkpoint_dir, n_chunks, (astate, vstate, key))
    logger.close()
    return final_stats


def main(argv=None):
    stats = run(argv)
    print("final eval:", {k: round(v, 3) for k, v in stats.items()}, flush=True)


if __name__ == "__main__":
    main()
