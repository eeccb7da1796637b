"""Metric logging: console + jsonl + optional TensorBoard.

Reference analog: MetricLogger multiplexing TensorBoard/wandb/SwanLab
(reference rlinf/utils/metric_logger.py:34-174) and the rollout statistics
helpers (rlinf/utils/distributed.py:34-186 compute_rollout_metrics).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(
        self,
        log_dir: Optional[str] = None,
        use_tensorboard: bool = False,
        print_every: int = 1,
    ):
        self.log_dir = log_dir
        self.print_every = print_every
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir)
                except Exception:
                    self._tb = None

    def log(self, metrics: Dict, step: int):
        scalars = {}
        for k, v in metrics.items():
            try:
                scalars[k] = float(np.asarray(v))
            except (TypeError, ValueError):
                continue
        if self._jsonl:
            self._jsonl.write(
                json.dumps({"step": step, "time": time.time(), **scalars}) + "\n"
            )
            self._jsonl.flush()
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self.print_every and step % self.print_every == 0:
            parts = " ".join(f"{k}={v:.4g}" for k, v in sorted(scalars.items()))
            print(f"[step {step}] {parts}", flush=True)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


def rollout_metrics(response_lengths, rewards, max_new_tokens: int) -> Dict[str, float]:
    """Response-length/reward stats (reference compute_rollout_metrics)."""
    lens = np.asarray(response_lengths, np.float32)
    r = np.asarray(rewards, np.float32)
    return {
        "rollout/response_len_mean": float(lens.mean()),
        "rollout/response_len_max": float(lens.max()),
        "rollout/response_len_min": float(lens.min()),
        "rollout/response_len_clip_ratio": float((lens >= max_new_tokens).mean()),
        "rollout/reward_mean": float(r.mean()),
        "rollout/reward_std": float(r.std()),
        "rollout/reward_max": float(r.max()),
        "rollout/reward_min": float(r.min()),
    }
