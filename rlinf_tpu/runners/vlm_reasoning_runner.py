"""GRPO on vision-language reasoning: [image | question] -> graded free text.

Reference analog: VLM GRPO e2e (reference tests/e2e_tests/ VLM configs) and
the VLM SFT worker (rlinf/workers/sft/megatron_vlm_sft_worker.py). Same
driver shape as ReasoningRunner — rollout / reward / advantages / PPO — but
the rollout prefills a multimodal prefix (ViT patches + question tokens)
through VLMReasoningModel instead of a token-only engine, and the train step
teacher-forces through the same multimodal forward so behavior and training
logprobs are the SAME computation (step-1 approx_kl ≈ 0 by construction).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.algorithms import get_advantage_fn
from rlinf_tpu.algorithms.rewards.qa_metrics import batch_vqa_rewards
from rlinf_tpu.config import TrainerConfig
from rlinf_tpu.data.datasets import VQADataset
from rlinf_tpu.models.vlm import VLMReasoningModel
from rlinf_tpu.training.learner import _token_level_loss, optax_global_norm
from rlinf_tpu.training.train_state import TrainState, create_train_state, make_optimizer
from rlinf_tpu.utils.checkpoint import CheckpointManager
from rlinf_tpu.utils.metrics import MetricLogger, rollout_metrics
from rlinf_tpu.utils.sync import host_sync
from rlinf_tpu.utils.timers import Timers


class VLMReasoningRunner:
    def __init__(
        self,
        cfg: TrainerConfig,
        tokenizer,
        dataset: VQADataset,
        model: Optional[VLMReasoningModel] = None,
        *,
        reward_fn=None,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.dataset = dataset
        self.model = model or VLMReasoningModel(vlm_cfg=cfg.model)
        self.reward_fn = reward_fn or batch_vqa_rewards
        self.timers = Timers()
        self.logger = MetricLogger(cfg.runner.log_dir)

        self.tx = make_optimizer(cfg.optimizer)
        self.state = create_train_state(
            self.model.init, self.tx, jax.random.PRNGKey(cfg.runner.seed)
        )
        self._rng = jax.random.PRNGKey(cfg.runner.seed + 1)

        sp = cfg.sampling
        self._gen = jax.jit(
            lambda p, rng, img, ids, mask: self.model.generate(
                p, rng, img, ids, mask, sp
            )
        )

        loss_cfg = cfg.loss
        temp = sp.temperature

        def train_step(state: TrainState, batch):
            def loss_fn(params):
                lp, ent = self.model.forward(
                    params, batch["images"], batch["prompt_ids"],
                    batch["prompt_mask"], batch["response_ids"],
                    batch["loss_mask"], temperature=temp,
                )
                global_valid = jnp.maximum(
                    jnp.sum(batch["loss_mask"].astype(jnp.float32)), 1.0
                )
                return _token_level_loss(lp, ent, batch, loss_cfg, global_valid)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = jax.tree_util.tree_map(
                lambda p, u: (
                    p.astype(jnp.float32) + u.astype(jnp.float32)
                ).astype(p.dtype),
                state.params, updates,
            )
            metrics = dict(metrics)
            metrics["actor/loss"] = loss
            metrics["actor/grad_norm"] = optax_global_norm(grads)
            return TrainState(state.step + 1, new_params, new_opt), metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0,))

        self.ckpt = (
            CheckpointManager(cfg.runner.checkpoint_dir)
            if cfg.runner.checkpoint_dir else None
        )
        self.global_step = 0
        if self.ckpt and cfg.runner.resume == "auto":
            state, _, step = self.ckpt.restore(self.state)
            if state is not None:
                self.state, self.global_step = state, step

    # ------------------------------------------------------------------
    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _sample_batch(self) -> List:
        n = self.cfg.runner.rollout_batch_size
        idx = np.random.default_rng(
            self.cfg.runner.seed * 100003 + self.global_step
        ).integers(0, len(self.dataset), n)
        return [self.dataset[int(i)] for i in idx]

    def _encode_prompts(self, examples):
        max_p = self.cfg.data.max_prompt_len
        ids = [self.tokenizer.encode(ex.question)[:max_p] for ex in examples]
        width = max(len(p) for p in ids)
        pad = self.cfg.sampling.pad_token_id
        # left-pad so generation starts right after the question
        out = np.full((len(ids), width), pad, np.int32)
        mask = np.zeros((len(ids), width), bool)
        for i, p in enumerate(ids):
            out[i, width - len(p):] = p
            mask[i, width - len(p):] = True
        return out, mask

    def run_step(self) -> Dict[str, float]:
        cfg = self.cfg
        step_start = time.perf_counter()
        G = cfg.algorithm.group_size

        examples = self._sample_batch()
        images = np.stack([VQADataset.load_image(ex) for ex in examples])
        prompt_ids, prompt_mask = self._encode_prompts(examples)
        # GRPO groups: repeat each example G times
        images_g = np.repeat(images, G, axis=0)
        ids_g = np.repeat(prompt_ids, G, axis=0)
        mask_g = np.repeat(prompt_mask, G, axis=0)
        answers_g = [ex.answers for ex in examples for _ in range(G)]

        with self.timers.scope("rollout"):
            out = self._gen(
                self.state.params, self._next_rng(),
                jnp.asarray(images_g), jnp.asarray(ids_g), jnp.asarray(mask_g),
            )
            resp_ids = np.asarray(out["response_ids"])
            resp_mask = np.asarray(out["response_mask"])
            resp_lp = np.asarray(out["response_logprobs"])

        with self.timers.scope("reward"):
            texts = [
                self.tokenizer.decode(
                    [int(t) for t, m in zip(row, mrow) if m]
                )
                for row, mrow in zip(resp_ids, resp_mask)
            ]
            rewards = np.asarray(
                self.reward_fn(texts, answers_g), np.float32
            )

        adv_fn = get_advantage_fn(cfg.algorithm.adv_type)
        adv, _ = adv_fn(
            rewards=jnp.asarray(rewards),
            loss_mask=jnp.asarray(resp_mask.T),
            group_size=G,
            normalize_advantages=cfg.algorithm.normalize_advantages,
        )
        adv = np.asarray(adv).T

        batch = {
            "images": jnp.asarray(images_g),
            "prompt_ids": jnp.asarray(ids_g),
            "prompt_mask": jnp.asarray(mask_g),
            "response_ids": jnp.asarray(resp_ids),
            "loss_mask": jnp.asarray(resp_mask),
            "old_logprobs": jnp.asarray(
                np.where(resp_mask, resp_lp, 0.0), jnp.float32
            ),
            "advantages": jnp.asarray(adv, jnp.float32),
        }
        with self.timers.scope("training"):
            metrics = {}
            for _ in range(cfg.runner.num_epochs):
                self.state, metrics = self._train_step(self.state, batch)
            host_sync(metrics)

        self.global_step += 1
        out_m = {k: float(np.asarray(v)) for k, v in metrics.items()}
        out_m.update(rollout_metrics(
            resp_mask.sum(1), rewards, cfg.sampling.max_new_tokens
        ))
        times = self.timers.consume()
        out_m.update({f"time/{k}": v for k, v in times.items()})
        out_m["time/step"] = time.perf_counter() - step_start
        self.logger.log(out_m, self.global_step)
        if self.ckpt and self.global_step % cfg.runner.save_interval == 0:
            self.ckpt.save(self.global_step, self.state)
        return out_m

    def run(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        n = max_steps or self.cfg.runner.max_steps
        history = []
        while self.global_step < n:
            history.append(self.run_step())
        return history
