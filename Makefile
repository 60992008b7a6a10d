# CI entry points (SURVEY.md §2a #14; VERDICT r1 item 9).
#
#   make ci-fast   — parity + unit tier, target < 5 min on a 2-core host
#   make ci-slow   — heavy tier: learning curves, multihost subprocess,
#                    native mass fuzz, tool e2e, golden curves
#   make ci        — both tiers (the full suite)
#   make bench     — headline bench (REAL TPU; one JSON line on stdout)
#   make dryrun    — multi-chip shard_map validation on 8 virtual devices
#   make scale     — weak-scaling + communication-volume evidence table
#
# Tests force the CPU backend with 8 virtual devices via tests/conftest.py;
# bench must see the real chip (do not set JAX_PLATFORMS for it).

PY ?= python

.PHONY: ci ci-fast ci-slow bench dryrun scale

ci-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

ci-slow:
	$(PY) -m pytest tests/ -q -m "slow"

ci:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

dryrun:
	$(PY) __graft_entry__.py

scale:
	$(PY) tools/scale.py
