"""VLM SFT: teacher-forced NLL on [image | question] -> answer text.

Reference analog: the VLM SFT worker
(reference rlinf/workers/sft/megatron_vlm_sft_worker.py) — supervised
finetuning of a vision-language model on VQA-style (image, question, answer)
triples. Reuses VLMReasoningModel's multimodal forward; the loss is the
answer tokens' cross-entropy (question/image prefix masked out), so an SFT'd
model drops straight into VLMReasoningRunner for GRPO.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.config import TrainerConfig
from rlinf_tpu.data.datasets import VQADataset
from rlinf_tpu.models.vlm import VLMReasoningModel
from rlinf_tpu.training.learner import optax_global_norm
from rlinf_tpu.training.train_state import TrainState, create_train_state, make_optimizer
from rlinf_tpu.utils.checkpoint import CheckpointManager
from rlinf_tpu.utils.metrics import MetricLogger
from rlinf_tpu.utils.sync import host_sync


class VLMSFTRunner:
    def __init__(
        self,
        cfg: TrainerConfig,
        tokenizer,
        dataset: VQADataset,
        model: Optional[VLMReasoningModel] = None,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.dataset = dataset
        self.model = model or VLMReasoningModel(vlm_cfg=cfg.model)
        self.logger = MetricLogger(cfg.runner.log_dir)
        self.tx = make_optimizer(cfg.optimizer)
        self.state = create_train_state(
            self.model.init, self.tx, jax.random.PRNGKey(cfg.runner.seed)
        )

        def train_step(state: TrainState, batch):
            def loss_fn(params):
                lp, _ = self.model.forward(
                    params, batch["images"], batch["prompt_ids"],
                    batch["prompt_mask"], batch["response_ids"],
                    batch["response_mask"],
                )
                mask = batch["loss_mask"].astype(jnp.float32)
                nll = -jnp.sum(lp * mask)
                valid = jnp.maximum(jnp.sum(mask), 1.0)
                return nll / valid, {"sft/valid_tokens": valid}

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = self.tx.update(
                grads, state.opt_state, state.params
            )
            new_params = jax.tree_util.tree_map(
                lambda p, u: (
                    p.astype(jnp.float32) + u.astype(jnp.float32)
                ).astype(p.dtype),
                state.params, updates,
            )
            metrics = dict(aux)
            metrics["sft/loss"] = loss
            metrics["sft/ppl"] = jnp.exp(loss)
            metrics["sft/grad_norm"] = optax_global_norm(grads)
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
    def _build_batch(self, examples) -> Dict[str, jnp.ndarray]:
        """Fixed-width (bucketed) multimodal SFT batch; loss on answer."""
        tok = self.tokenizer
        max_p = self.cfg.data.max_prompt_len
        images = np.stack([VQADataset.load_image(ex) for ex in examples])
        prompts = [tok.encode(ex.question)[:max_p] for ex in examples]
        answers = [
            tok.encode(ex.answers[0]) + (
                [tok.eos_id] if getattr(tok, "eos_id", None) is not None
                else []
            )
            for ex in examples
        ]
        B = len(examples)
        P = max(len(p) for p in prompts)
        N = max(len(a) for a in answers)
        pad = self.cfg.sampling.pad_token_id
        prompt_ids = np.full((B, P), pad, np.int32)
        prompt_mask = np.zeros((B, P), bool)
        resp_ids = np.full((B, N), pad, np.int32)
        resp_mask = np.zeros((B, N), bool)
        for i, (p, a) in enumerate(zip(prompts, answers)):
            prompt_ids[i, P - len(p):] = p       # left-pad prompts
            prompt_mask[i, P - len(p):] = True
            resp_ids[i, :len(a)] = a
            resp_mask[i, :len(a)] = True
        return {
            "images": jnp.asarray(images),
            "prompt_ids": jnp.asarray(prompt_ids),
            "prompt_mask": jnp.asarray(prompt_mask),
            "response_ids": jnp.asarray(resp_ids),
            "response_mask": jnp.asarray(resp_mask),
            "loss_mask": jnp.asarray(resp_mask),
        }

    def run_step(self) -> Dict[str, float]:
        t0 = time.perf_counter()
        n = self.cfg.runner.rollout_batch_size
        rng = np.random.default_rng(
            self.cfg.runner.seed * 9176 + self.global_step
        )
        idx = rng.integers(0, len(self.dataset), n)
        batch = self._build_batch([self.dataset[int(i)] for i in idx])
        self.state, metrics = self._train_step(self.state, batch)
        host_sync(metrics)
        self.global_step += 1
        out = {k: float(np.asarray(v)) for k, v in metrics.items()}
        out["time/step"] = time.perf_counter() - t0
        self.logger.log(out, self.global_step)
        if self.ckpt and self.global_step % self.cfg.runner.save_interval == 0:
            self.ckpt.save(self.global_step, self.state)
        return out

    def run(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        n = max_steps or self.cfg.runner.max_steps
        history = []
        while self.global_step < n:
            history.append(self.run_step())
        return history
