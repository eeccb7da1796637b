"""SFT driver loop (reference: rlinf/runners SFTRunner + workers/sft/).

Consumes (prompt, response) pairs, assembles the standard TrainBatch layout
(loss on response tokens only), and runs the jitted SFT step with the usual
checkpoint/metrics plumbing.
"""

from __future__ import annotations

import dataclasses

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.config import TrainerConfig
from rlinf_tpu.data.datasets import PromptDataset, StatefulBatchIterator
from rlinf_tpu.models.llm import init_params, model as M
from rlinf_tpu.training.sft import make_sft_train_step
from rlinf_tpu.training.train_state import create_train_state, make_optimizer
from rlinf_tpu.utils.checkpoint import CheckpointManager
from rlinf_tpu.utils.metrics import MetricLogger
from rlinf_tpu.utils.sync import host_sync


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class SFTRunner:
    def __init__(
        self,
        cfg: TrainerConfig,
        tokenizer,
        dataset: PromptDataset,
        *,
        init_params_override=None,
        mesh=None,
        seq_bucket: int = 64,
    ):
        from rlinf_tpu.config import resolve_attn_impl

        cfg = dataclasses.replace(cfg, attn_impl=resolve_attn_impl(cfg))
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.seq_bucket = seq_bucket
        self.logger = MetricLogger(cfg.runner.log_dir)
        self.tx = make_optimizer(cfg.optimizer)
        self.train_step = make_sft_train_step(
            cfg.model, self.tx,
            num_microbatches=cfg.num_microbatches,
            remat=cfg.remat, attn_impl=cfg.attn_impl,
            logprob_chunk_size=cfg.loss.logprob_chunk_size,
        )
        rng = jax.random.PRNGKey(cfg.runner.seed)
        self._rng, init_rng = jax.random.split(rng)
        init_fn = init_params_override or (lambda r: init_params(cfg.model, r))
        self.state = create_train_state(
            init_fn, self.tx, init_rng, mesh=mesh,
            partition_rules=M.partition_rules() if mesh else None,
        )
        self.iterator = StatefulBatchIterator(
            dataset, cfg.runner.rollout_batch_size, seed=cfg.runner.seed
        )
        self.ckpt = (
            CheckpointManager(cfg.runner.checkpoint_dir)
            if cfg.runner.checkpoint_dir else None
        )
        self.global_step = 0
        if self.ckpt and cfg.runner.resume == "auto":
            state, extra, step = self.ckpt.restore(self.state)
            if state is not None:
                self.state = state
                self.global_step = step
                if extra and "dataloader" in extra:
                    self.iterator.load_state_dict(extra["dataloader"])

    def _build_batch(self, examples) -> Dict[str, jnp.ndarray]:
        max_p = self.cfg.data.max_prompt_len
        rows = []
        for ex in examples:
            p = self.tokenizer.encode(ex.prompt)[:max_p]
            r = self.tokenizer.encode(ex.answer)
            if getattr(self.tokenizer, "eos_id", None) is not None:
                r = r + [self.tokenizer.eos_id]
            rows.append((p, r))
        T = _round_up(max(len(p) + len(r) for p, r in rows), self.seq_bucket)
        B = len(rows)
        pad = self.cfg.sampling.pad_token_id
        input_ids = np.full((B, T), pad, np.int32)
        attention_mask = np.zeros((B, T), bool)
        target_ids = np.full((B, T), pad, np.int32)
        loss_mask = np.zeros((B, T), bool)
        for i, (p, r) in enumerate(rows):
            seq = np.asarray(p + r, np.int32)[:T]
            n, np_ = len(seq), len(p)
            input_ids[i, :n] = seq
            attention_mask[i, :n] = True
            target_ids[i, : n - 1] = seq[1:]
            loss_mask[i, np_ - 1 : n - 1] = True
        return {
            "input_ids": jnp.asarray(input_ids),
            "attention_mask": jnp.asarray(attention_mask),
            "target_ids": jnp.asarray(target_ids),
            "loss_mask": jnp.asarray(loss_mask),
        }

    def run_step(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        batch = self._build_batch(self.iterator.next_batch())
        self.state, metrics = self.train_step(self.state, batch)
        host_sync(metrics)
        self.global_step += 1
        out = {k: float(np.asarray(v)) for k, v in metrics.items()}
        out["time/step"] = time.perf_counter() - t0
        self.logger.log(out, self.global_step)
        if self.ckpt and self.global_step % self.cfg.runner.save_interval == 0:
            self.ckpt.save(
                self.global_step, self.state,
                extra={"dataloader": self.iterator.state_dict()},
            )
        return out

    def run(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        n = max_steps or self.cfg.runner.max_steps
        history = []
        while self.global_step < n:
            history.append(self.run_step())
        return history
