"""safe_grid_agents_tpu — a TPU-native safety-gridworlds RL framework.

A from-scratch JAX/XLA rebuild of the capabilities of the reference repo
``jvmncs/safe-grid-agents`` (see SURVEY.md):

* ``envs``     — pure array-based gridworld engine (replaces pycolab
                 sprites/drapes with compact per-instance state + static spec
                 arrays), vectorized with ``vmap`` and auto-reset under ``jit``.
* ``oracle``   — slow, independently written per-env Python engines used as
                 the parity ground truth (the reference's pycolab stack is not
                 importable here; our oracle defines the canonical semantics).
* ``agents``   — tabular Q, DQN, PPO (MLP/CNN/CRMDP) and dummy baselines,
                 built on flax/optax with fully jitted train steps.
* ``training`` — fused rollout+update train loops, eval, warmup, metrics.
* ``parallel`` — ``jax.sharding`` mesh runtime: env shards over the ``data``
                 axis, gradient ``psum`` over ICI, same code 1-chip and N-chip.
* ``ops``      — Pallas TPU kernels for hot paths.
* ``cli``      — alias-based command line mirroring the reference's
                 ``<env> <agent> --flags`` surface.

Reference provenance: /root/reference was empty at build time (SURVEY.md §0);
behavioral specs follow SURVEY.md §2c and are documented per env module.
"""

__version__ = "0.1.0"
