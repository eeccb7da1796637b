"""Operational toolkits: replay-buffer ops, trajectory visualization,
realworld preflight checks, standalone eval.

Reference analog: the top-level ``toolkits/`` tree (reference
toolkits/replay_buffer/, toolkits/realworld_check/,
toolkits/standalone_eval_scripts/, ~10.9k LoC) — re-designed as thin CLIs
over rlinf_tpu's own storage formats and registries.
"""
