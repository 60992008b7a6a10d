"""CLI argument surface (reference safe_grid_agents/parsing/, SURVEY.md §2a
#2): positional env alias → positional agent alias → per-agent flags, with
alias registries. The reference declared flag groups in three YAML files
feeding nested argparse; here the same declaration lives in the FLAG_GROUPS
table below (one source of truth, no YAML dependency) and flag names match
the reference's where they exist (--lr --discount --epsilon --batch-size
--replay-capacity --sync-every --epochs --clipping --entropy-bonus --cheat
--seed --log-dir --eval-* ...).
"""
from __future__ import annotations

import argparse
from typing import Any, Dict

from ..agents import AGENT_REGISTRY
from ..envs import ENV_REGISTRY

# flag → (type, default=None means "use the agent's default", help)
AGENT_FLAGS: Dict[str, Dict[str, tuple]] = {
    "common": {
        "--lr": (float, "learning rate"),
        "--discount": (float, "discount factor γ"),
    },
    "explorer": {
        "--epsilon": (float, "initial exploration rate"),
        "--epsilon-final": (float, "final exploration rate"),
        "--epsilon-anneal-steps": (int, "linear anneal horizon (env steps)"),
    },
    "net": {
        # Reference deep.py net-shape flags [M] (SURVEY.md §2a #9): the
        # hidden stack is (n_hidden,) * n_layers. Translated to the agents'
        # ``hidden`` tuple in agent_kwargs().
        "--n-layers": (int, "hidden layers in the policy/Q net"),
        "--n-hidden": (int, "units per hidden layer"),
        "--table-net": (bool, "fold the compiled env's observation table "
                              "into the first dense layer (fastest net; "
                              "requires --compiled; deep-q and ppo-mlp)"),
    },
    "deep-q": {
        "--batch-size": (int, "replay sample size per update"),
        "--replay-capacity": (int, "replay ring capacity (global)"),
        "--sync-every": (int, "target-network hard sync period (updates)"),
        "--double-q": (bool, "double DQN: online net selects the bootstrap "
                             "action, target net evaluates it"),
        "--prioritized": (bool, "prioritized replay (proportional, "
                                "importance-weighted; Schaul et al. 2015)"),
        "--per-alpha": (float, "PER priority exponent α"),
        "--per-beta": (float, "PER initial importance-correction β (anneals "
                              "to 1 over the ε horizon)"),
        "--per-clip": (float, "PER priority clip on |TD error| (load-bearing "
                              "with unclipped ±50 rewards)"),
        "--per-eps": (float, "PER resample floor as a fraction of the clip "
                             "(bounds mastered-vs-frontier resample ratio at "
                             "(1+eps)/eps)"),
        "--n-step": (int, "n-step return horizon for the TD target "
                          "(bootstrap pays gamma^n)"),
    },
    "ppo": {
        "--clipping": (float, "PPO clip ε"),
        "--entropy-bonus": (float, "entropy bonus coefficient"),
        "--entropy-final": (float, "annealed final entropy coefficient"),
        "--entropy-anneal-steps": (int, "entropy anneal horizon (env steps; 0=const)"),
        "--epochs": (int, "optimization epochs per rollout"),
        "--n-minibatches": (int, "minibatches per epoch"),
        "--gae-lambda": (float, "GAE λ"),
        "--value-coef": (float, "value-loss coefficient"),
    },
    "ppo-crmdp": {
        "--crmdp-lr": (float, "corruption-attribution NLMS step size"),
    },
}

# Which flag groups feed which agent's constructor.
AGENT_GROUPS = {
    "random": [],
    "single": [],
    "tabular-q": ["common", "explorer"],
    "deep-q": ["common", "explorer", "net", "deep-q"],
    "ppo-mlp": ["common", "net", "ppo"],
    "ppo-cnn": ["common", "net", "ppo"],
    "ppo-crmdp": ["common", "net", "ppo", "ppo-crmdp"],
}


def prepare_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="safe_grid_agents_tpu",
        description="TPU-native safety-gridworlds RL (usage mirrors the "
        "reference: <env-alias> <agent-alias> [flags])",
    )
    p.add_argument("env", choices=sorted(ENV_REGISTRY), help="environment alias")
    p.add_argument("agent", choices=sorted(AGENT_REGISTRY), help="agent alias")

    run = p.add_argument_group("run")
    run.add_argument("--preset", action="store_true",
                     help="apply the known-good preset for this (env, agent) "
                          "from cli/presets.yaml; explicit flags override")
    run.add_argument("--seed", type=int, default=0)
    run.add_argument("--log-dir", type=str, default=None)
    run.add_argument("--n-envs", type=int, default=128, help="vectorized env instances")
    run.add_argument("--steps", type=int, default=500_000, help="total env steps")
    run.add_argument("--chunk-steps", type=int, default=64, help="env steps per fused chunk")
    run.add_argument("--chunks-per-dispatch", type=int, default=1,
                     help="train chunks scanned inside ONE device dispatch "
                          "(amortizes host/tunnel round-trip latency; stats "
                          "are merged per dispatch, so logging/eval/"
                          "checkpoint cadence counts dispatches)")
    run.add_argument("--eval-every", "--eval-period", dest="eval_every",
                     type=int, default=20,
                     help="eval every N chunks (reference: --eval-period)")
    run.add_argument("--eval-steps", type=int, default=120, help="greedy eval steps")
    run.add_argument("--eval-episodes", type=int, default=None,
                     help="run each eval until at least this many episodes "
                          "finish (reference --eval-episodes); the step "
                          "bound grows as needed via the episode timeout")
    run.add_argument("--cheat", action="store_true",
                     help="train on the hidden performance signal (debug upper bound)")
    run.add_argument("--compiled", action="store_true",
                     help="lower the env to the lookup-table engine (bitwise-"
                          "identical, fastest; enumerable envs only)")
    run.add_argument("--mxu", action="store_true",
                     help="step the env on the MXU fused rollout engine "
                          "(requires --compiled): tabular-q is fully matmul-"
                          "native, deep-q collects streaming TableState "
                          "records, and the ppo family collects index-native "
                          "rollouts with the fast optimize layout")
    run.add_argument("--fused-kernel", action="store_true",
                     help="with --mxu on a deterministic-reset env: "
                          "tabular-q runs the whole act→step→learn loop "
                          "inside one pallas kernel (ops/tabular_kernel.py); "
                          "deep-q runs its collect phase in one kernel "
                          "(ops/dqn_kernel.py) with the XLA update phase "
                          "unchanged; ppo-mlp --table-net runs its whole "
                          "epochs×minibatches optimize phase in one kernel "
                          "(ops/ppo_kernel.py). Own bulk-draw RNG protocol "
                          "where applicable, single device")
    run.add_argument("--mxu-parity", action="store_true",
                     help="with --mxu + a ppo agent: run the base trainer's "
                          "exact optimize instead of the fast layout — "
                          "bitwise-equal to the non-MXU trainer (debug/"
                          "verification mode)")
    run.add_argument("--n-devices", type=int, default=1,
                     help="devices in the mesh (data axis, divided by --tp)")
    run.add_argument("--tp", type=int, default=1,
                     help="tensor-parallel width (mesh axis 'model'; mesh = "
                          "(n-devices/tp) x tp, GSPMD runtime; deep agents)")
    run.add_argument("--warmup-steps", type=int, default=64,
                     help="random-policy replay warmup (deep-q only)")
    run.add_argument("--updates-per-chunk", type=int, default=None,
                     help="gradient updates per chunk (deep-q; default = chunk-steps)")

    run.add_argument("--eval-env", type=str, default=None, choices=sorted(ENV_REGISTRY),
                     help="evaluate on a different env alias (the "
                          "distributional-shift protocol: train on 'shift', "
                          "eval on 'shift-test')")
    run.add_argument("--platform", type=str, default=None,
                     help="force a jax platform, e.g. 'cpu' (the reference's "
                          "--disable-cuda analogue); must be the first device "
                          "decision of the process")
    run.add_argument("--debug-nans", action="store_true",
                     help="enable jax_debug_nans (SURVEY.md §5 sanitizers): "
                          "fail fast on NaNs from any jitted computation")
    run.add_argument("--profile-dir", type=str, default=None,
                     help="write a jax.profiler trace (TensorBoard/Perfetto) "
                          "covering a mid-training chunk window")

    ckpt = p.add_argument_group("checkpoint")
    ckpt.add_argument("--checkpoint-dir", type=str, default=None)
    ckpt.add_argument("--checkpoint-every", type=int, default=50, help="chunks")
    ckpt.add_argument("--resume", action="store_true")

    agent = p.add_argument_group("agent")
    seen = set()
    for group in AGENT_FLAGS.values():
        for flag, (typ, help_) in group.items():
            if flag not in seen:
                if typ is bool:
                    # default=None (not False) so agent_kwargs only forwards
                    # the flag when the user actually passed it. The --no-
                    # counterpart lets presets that enable a boolean be
                    # overridden off from the CLI.
                    agent.add_argument(flag, action="store_true", default=None,
                                       help=help_)
                    agent.add_argument(
                        f"--no-{flag[2:]}",
                        dest=flag[2:].replace("-", "_"),
                        action="store_false", default=None,
                        help=f"disable {flag} (e.g. over a preset)",
                    )
                else:
                    agent.add_argument(flag, type=typ, default=None, help=help_)
                seen.add(flag)
    return p


def apply_preset(args: argparse.Namespace, argv) -> argparse.Namespace:
    """Overlay preset values for (env, agent) under flags the user did NOT
    pass explicitly (reference mechanism: YAML-declared defaults)."""
    import os

    import yaml

    path = os.path.join(os.path.dirname(__file__), "presets.yaml")
    with open(path) as f:
        presets = yaml.safe_load(f)
    table = (presets.get(args.env) or {}).get(args.agent)
    if not table:
        raise SystemExit(
            f"no preset for env {args.env!r} + agent {args.agent!r}; "
            f"available: { {e: sorted(a) for e, a in presets.items()} }"
        )
    # Explicit flags may appear as '--flag value', '--flag=value', or an
    # unambiguous argparse prefix abbreviation. Resolve each token against
    # the parser's real flag set: an exact flag marks exactly itself (so
    # `--epsilon` does NOT shadow the preset's `--epsilon-final`), and a
    # prefix marks a flag only when the match is unique — mirroring how
    # argparse itself resolves abbreviations.
    known = {
        s for s in prepare_parser()._option_string_actions if s.startswith("--")
    }
    explicit = set()
    for tok in argv or []:
        if not tok.startswith("--"):
            continue
        tok = tok.split("=", 1)[0]
        if tok in known:
            explicit.add(tok)
        else:
            matches = [f for f in known if f.startswith(tok)]
            if len(matches) == 1:  # unique abbreviation, as argparse allows
                explicit.add(matches[0])

    def was_explicit(flag: str) -> bool:
        full = f"--{flag}"
        return full in explicit or f"--no-{flag}" in explicit

    for flag, value in table.items():
        if was_explicit(flag):
            continue
        setattr(args, flag.replace("-", "_"), value)
    return args


def agent_kwargs(args: argparse.Namespace) -> Dict[str, Any]:
    """Constructor kwargs for the chosen agent: only flags the user set,
    filtered to the agent's flag groups."""
    out: Dict[str, Any] = {}
    for group in AGENT_GROUPS[args.agent]:
        for flag in AGENT_FLAGS[group]:
            name = flag.lstrip("-").replace("-", "_")
            val = getattr(args, name)
            if val is not None:
                out[name] = val
    # Net-shape flags translate to the agents' ``hidden`` tuple; either flag
    # alone keeps the other dimension at its default (2 × 128).
    n_layers = out.pop("n_layers", None)
    n_hidden = out.pop("n_hidden", None)
    if n_layers is not None or n_hidden is not None:
        out["hidden"] = (n_hidden or 128,) * (n_layers or 2)
    # --table-net: the table-folded fast path (compiled envs only). Checked
    # against args directly (not the group-filtered dict) so passing it with
    # an incompatible agent fails loudly instead of being silently dropped.
    out.pop("table_net", None)
    if getattr(args, "table_net", None):
        if not args.compiled:
            raise SystemExit("--table-net requires --compiled")
        if args.agent == "deep-q":
            out["table"] = True
        elif args.agent in ("ppo-mlp", "ppo-crmdp"):
            # ppo-crmdp rides the fused-kernel path since the round-5
            # closing, which needs the table-folded net like ppo-mlp's.
            out["net"] = "table"
        else:
            raise SystemExit(
                "--table-net supports deep-q, ppo-mlp, and ppo-crmdp, "
                f"not {args.agent!r}"
            )
    return out
