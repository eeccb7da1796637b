"""GRPO/PPO reasoning RL driver loop.

TPU-native re-design of the reference's ReasoningRunner
(reference rlinf/runners/reasoning_runner.py:54,431): instead of orchestrating
Ray worker groups through channels, the driver calls three jitted programs in
sequence per global step —

  1. rollout:   generate(params, prompts)                [decode-shaped phase]
  2. reward:    host-side rule verification              [CPU, overlappable]
  3. training:  train_step(state, batch) x minibatches   [train-shaped phase]

Weight sync (reference step 2, _sync_weights :418) is free: the same sharded
params pytree flows from train_step back into generate. The reference's
recompute-logprobs inference phase (:1173) is the optional ``logprob_fn``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.algorithms import get_advantage_fn
from rlinf_tpu.algorithms.rewards.math_verifier import batch_math_rewards
from rlinf_tpu.config import TrainerConfig
from rlinf_tpu.data.datasets import PromptDataset, StatefulBatchIterator
from rlinf_tpu.data.io_struct import RolloutRequest, RolloutResult, build_train_batch
from rlinf_tpu.models.llm import init_params, model as M
from rlinf_tpu.rollout.engine import RolloutEngine
from rlinf_tpu.training.learner import (
    make_logprob_fn,
    make_policy_grad_and_apply,
    make_policy_train_step,
)
from rlinf_tpu.training.train_state import TrainState, create_train_state, make_optimizer
from rlinf_tpu.utils.checkpoint import CheckpointManager
from rlinf_tpu.utils.metrics import MetricLogger, rollout_metrics
from rlinf_tpu.utils.timers import Timers


class ReasoningRunner:
    def __init__(
        self,
        cfg: TrainerConfig,
        tokenizer,
        dataset: PromptDataset,
        *,
        init_params_override=None,
        mesh: Optional[jax.sharding.Mesh] = None,
        reward_fn=None,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.reward_fn = reward_fn or batch_math_rewards
        self.timers = Timers()
        self.logger = MetricLogger(cfg.runner.log_dir)

        self.engine = RolloutEngine(
            cfg.model, cfg.sampling, attn_impl=cfg.attn_impl
        )
        self.tx = make_optimizer(cfg.optimizer)
        self.train_step = make_policy_train_step(
            cfg.model, cfg.loss, self.tx,
            num_microbatches=cfg.num_microbatches,
            remat=cfg.remat, attn_impl=cfg.attn_impl, mesh=mesh,
        )
        if cfg.loss.max_tokens_per_mb > 0:
            self._grad_step, self._apply_step, self._zero_grads = (
                make_policy_grad_and_apply(
                    cfg.model, cfg.loss, self.tx,
                    remat=cfg.remat, attn_impl=cfg.attn_impl,
                )
            )
        self.logprob_fn = (
            make_logprob_fn(
                cfg.model,
                chunk_size=cfg.loss.logprob_chunk_size,
                attn_impl=cfg.attn_impl,
                temperature=cfg.sampling.temperature,
            )
            if cfg.algorithm.recompute_logprobs
            else None
        )

        init_fn = init_params_override or (
            lambda rng: init_params(cfg.model, rng)
        )
        rng = jax.random.PRNGKey(cfg.runner.seed)
        self._rng, init_rng = jax.random.split(rng)
        self.state = create_train_state(
            init_fn, self.tx, init_rng,
            mesh=mesh, partition_rules=M.partition_rules() if mesh else None,
        )

        self.iterator = StatefulBatchIterator(
            dataset, cfg.runner.rollout_batch_size, seed=cfg.runner.seed
        )
        self.ckpt = (
            CheckpointManager(cfg.runner.checkpoint_dir)
            if cfg.runner.checkpoint_dir
            else None
        )
        self.global_step = 0
        if self.ckpt and cfg.runner.resume == "auto":
            state, extra, step = self.ckpt.restore(self.state)
            if state is not None:
                self.state = state
                self.global_step = step
                if extra and "dataloader" in extra:
                    self.iterator.load_state_dict(extra["dataloader"])

    # ------------------------------------------------------------------
    def _next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _make_request(self, examples) -> RolloutRequest:
        max_p = self.cfg.data.max_prompt_len
        prompt_ids = [
            self.tokenizer.encode(ex.prompt)[:max_p] for ex in examples
        ]
        answers = [ex.answer for ex in examples]
        return RolloutRequest(prompt_ids=prompt_ids, answers=answers).repeat(
            self.cfg.algorithm.group_size
        )

    def _compute_advantages(self, result: RolloutResult, rewards: np.ndarray):
        a = self.cfg.algorithm
        adv_fn = get_advantage_fn(a.adv_type)
        loss_mask_lb = jnp.asarray(result.response_mask.T)  # [N, B]
        adv, _ = adv_fn(
            rewards=jnp.asarray(rewards),
            loss_mask=loss_mask_lb,
            group_size=a.group_size,
            normalize_advantages=a.normalize_advantages,
        )
        return np.asarray(adv).T  # [B, N]

    def _dynamic_minibatch_update(self, batch_dict, train_batch, mb_idx):
        """Token-budget microbatching path (reference dynamic batch size):
        pack the minibatch's rows under max_tokens_per_mb, accumulate grads
        over the packed microbatches, one optimizer step."""
        from rlinf_tpu.data.dynamic_batching import pack_microbatches

        np_batch = {k: np.asarray(v)[mb_idx] for k, v in batch_dict.items()}
        lengths = np_batch["attention_mask"].sum(-1).astype(int)
        mbs = pack_microbatches(
            np_batch, lengths, self.cfg.loss.max_tokens_per_mb
        )
        global_valid = jnp.asarray(
            max(float(np_batch["loss_mask"].sum()), 1.0), jnp.float32
        )
        grads = self._zero_grads(self.state.params)
        total_loss, metrics = 0.0, {}
        for mb in mbs:
            mb_j = {k: jnp.asarray(v) for k, v in mb.items()}
            grads, loss, metrics = self._grad_step(
                self.state.params, grads, mb_j, global_valid
            )
            total_loss += float(np.asarray(loss))
        self.state, grad_norm = self._apply_step(self.state, grads)
        metrics = dict(metrics)
        metrics["actor/loss"] = total_loss
        metrics["actor/grad_norm"] = grad_norm
        metrics["actor/num_dyn_microbatches"] = float(len(mbs))
        return metrics

    def run_step(self) -> Dict[str, float]:
        cfg = self.cfg
        step_start = time.perf_counter()

        # 1. data + rollout -------------------------------------------------
        examples = self.iterator.next_batch()
        request = self._make_request(examples)
        with self.timers.scope("rollout"):
            result = self.engine.rollout(
                self.state.params, request, self._next_rng()
            )

        # 2. rewards --------------------------------------------------------
        with self.timers.scope("reward"):
            texts = result.response_texts(self.tokenizer)
            rewards = np.asarray(
                self.reward_fn(texts, result.answers), np.float32
            )
            result.rewards = rewards

        # 3. advantages + batch assembly ------------------------------------
        token_advantages = self._compute_advantages(result, rewards)
        train_batch = build_train_batch(
            result, token_advantages, pad_id=cfg.sampling.pad_token_id
        )
        batch_dict = {k: jnp.asarray(v) for k, v in train_batch.to_dict().items()}

        # 3b. optional fp32 logprob recompute (reference run_inference)
        if self.logprob_fn is not None:
            lp, _ = self.logprob_fn(self.state.params, batch_dict)
            batch_dict["old_logprobs"] = jnp.where(
                batch_dict["loss_mask"], lp, 0.0
            )

        # 4. training -------------------------------------------------------
        B = train_batch.input_ids.shape[0]
        n_mini = cfg.runner.num_mini_batches
        metrics = {}
        with self.timers.scope("training"):
            perm = np.arange(B)
            for epoch in range(cfg.runner.num_epochs):
                if cfg.runner.num_epochs > 1 or n_mini > 1:
                    perm = np.asarray(
                        jax.random.permutation(self._next_rng(), B)
                    )
                for mb_idx in np.split(perm, n_mini):
                    if cfg.loss.max_tokens_per_mb > 0:
                        metrics = self._dynamic_minibatch_update(
                            batch_dict, train_batch, mb_idx
                        )
                    else:
                        mb = {
                            k: v[jnp.asarray(mb_idx)]
                            for k, v in batch_dict.items()
                        }
                        self.state, metrics = self.train_step(self.state, mb)
            jax.block_until_ready(metrics)

        # 5. metrics / checkpoint ------------------------------------------
        self.global_step += 1
        out = {k: float(np.asarray(v)) for k, v in metrics.items()}
        out.update(
            rollout_metrics(
                result.response_lengths, rewards, cfg.sampling.max_new_tokens
            )
        )
        out.update({f"time/{k}": v for k, v in self.timers.consume().items()})
        out["time/step"] = time.perf_counter() - step_start
        self.logger.log(out, self.global_step)

        if (
            self.ckpt
            and self.global_step % cfg.runner.save_interval == 0
        ):
            self.ckpt.save(
                self.global_step,
                self.state,
                extra={"dataloader": self.iterator.state_dict()},
            )
        return out

    def run(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        n = max_steps or self.cfg.runner.max_steps
        history = []
        while self.global_step < n:
            history.append(self.run_step())
        return history
