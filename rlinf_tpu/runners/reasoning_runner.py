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
from rlinf_tpu.rollout import build_rollout_engine
from rlinf_tpu.training.learner import (
    make_actor_critic_train_step,
    make_logprob_fn,
    make_policy_grad_and_apply,
    make_policy_train_step,
)
from rlinf_tpu.training.train_state import TrainState, create_train_state, make_optimizer
from rlinf_tpu.utils.checkpoint import CheckpointManager
from rlinf_tpu.utils.metrics import MetricLogger, rollout_metrics
from rlinf_tpu.utils.timers import Timers
from rlinf_tpu.utils.sync import host_sync


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
        from rlinf_tpu.config import resolve_attn_impl

        cfg = dataclasses.replace(cfg, attn_impl=resolve_attn_impl(cfg))
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh
        self.reward_fn = reward_fn or batch_math_rewards
        self.timers = Timers()
        self.logger = MetricLogger(cfg.runner.log_dir)

        # Engine choice per cfg.rollout (reference rollout.backend):
        # continuous slot-pool batching by default, static under a mesh.
        self.engine = build_rollout_engine(cfg, mesh=mesh)
        self.tx = make_optimizer(cfg.optimizer)
        self.with_critic = cfg.algorithm.adv_type == "gae"
        self.separate_critic = (
            self.with_critic and cfg.algorithm.critic == "separate"
        )
        self.critic_state = None
        if self.separate_critic:
            # First-class PPO: the critic is its own model + optimizer +
            # warmup schedule (reference MegatronCritic,
            # rlinf/workers/critic/megatron_critic_worker.py). The actor
            # trains with the plain policy step; GAE consumes the separate
            # critic's values.
            from rlinf_tpu.training.critic import (
                CriticConfig, init_critic_params, make_critic_train_step,
                make_critic_value_fn,
            )

            self.critic_cfg = CriticConfig(
                warmup_steps=cfg.algorithm.critic_warmup_steps,
                lr=cfg.algorithm.critic_lr,
            )
            opt = cfg.optimizer
            if self.critic_cfg.lr is not None:
                opt = dataclasses.replace(opt, lr=self.critic_cfg.lr)
            self.critic_tx = make_optimizer(opt)
            self.critic_step = make_critic_train_step(
                cfg.model, self.critic_cfg, self.critic_tx,
                remat=cfg.remat, attn_impl=cfg.attn_impl, mesh=mesh,
            )
            from rlinf_tpu.models.llm.value_head import value_partition_rules

            self.critic_state = create_train_state(
                lambda rng: init_critic_params(cfg.model, rng),
                self.critic_tx,
                jax.random.PRNGKey(cfg.runner.seed + 104729),
                mesh=mesh,
                partition_rules=(
                    value_partition_rules() + M.partition_rules()
                    if mesh else None
                ),
            )
            self._raw_value_fn = make_critic_value_fn(
                cfg.model, attn_impl=cfg.attn_impl
            )
            self._value_fn = lambda _actor_params, ids, mask: (
                self._raw_value_fn(self.critic_state.params, ids, mask)
            )
            self.train_step = make_policy_train_step(
                cfg.model, cfg.loss, self.tx,
                num_microbatches=cfg.num_microbatches,
                remat=cfg.remat, attn_impl=cfg.attn_impl, mesh=mesh,
            )
        elif self.with_critic:
            # PPO with a learned critic (value head on the shared trunk) —
            # the reference's MegatronCritic path (critic worker + GAE).
            self.train_step = make_actor_critic_train_step(
                cfg.model, cfg.loss, self.tx,
                remat=cfg.remat, attn_impl=cfg.attn_impl,
            )
            from rlinf_tpu.models.llm.value_head import forward_values

            self._value_fn = jax.jit(
                lambda params, ids, mask: forward_values(
                    params, cfg.model, ids, mask, attn_impl=cfg.attn_impl
                )
            )
        elif cfg.lora.enabled:
            # LoRA mode (reference guides/lora.rst is_lora/lora_rank): train
            # only the low-rank adapters; base params stay frozen and are
            # passed to the jitted step as a runtime argument.
            assert cfg.loss.max_tokens_per_mb == 0, (
                "LoRA + dynamic token-budget microbatching not supported yet"
            )
            from rlinf_tpu.training.lora_learner import make_lora_policy_train_step

            lora_step = make_lora_policy_train_step(
                cfg.model, cfg.loss, self.tx, cfg.lora,
                num_microbatches=cfg.num_microbatches,
                remat=cfg.remat, attn_impl=cfg.attn_impl,
            )
            self.train_step = lambda state, batch: lora_step(
                state, self.base_params, batch
            )
        else:
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
        # Logprob-consistency invariant: auto-enable the fp32 recompute when
        # the rollout decode path differs from the training path (int8 quant
        # / pallas decode) so PPO ratios are anchored to the training-path
        # policy — step-1 approx_kl ≈ 0 by construction.
        from rlinf_tpu.rollout import resolve_recompute_logprobs

        self.recompute_logprobs = resolve_recompute_logprobs(cfg, mesh=mesh)
        self.logprob_fn = (
            make_logprob_fn(
                cfg.model,
                chunk_size=cfg.loss.logprob_chunk_size,
                attn_impl=cfg.attn_impl,
                temperature=cfg.sampling.temperature,
            )
            if self.recompute_logprobs
            else None
        )

        base_init = init_params_override or (
            lambda rng: init_params(cfg.model, rng)
        )
        if self.with_critic and not self.separate_critic:
            from rlinf_tpu.models.llm.value_head import add_value_head

            init_fn = lambda rng: add_value_head(
                base_init(rng), cfg.model, jax.random.fold_in(rng, 7)
            )
        else:
            # separate critic: the actor trunk carries no value head — the
            # critic owns its own trunk (self.critic_state)
            init_fn = base_init
        rng = jax.random.PRNGKey(cfg.runner.seed)
        self._rng, init_rng = jax.random.split(rng)
        if cfg.lora.enabled and not self.with_critic:
            from rlinf_tpu.models.llm.lora import init_lora_params, merge_lora
            from rlinf_tpu.parallel.sharding import (
                match_partition_rules, shard_pytree,
            )

            self.base_params = init_fn(jax.random.fold_in(init_rng, 11))
            if mesh is not None:
                specs = match_partition_rules(
                    M.partition_rules(), self.base_params
                )
                self.base_params = shard_pytree(self.base_params, specs, mesh)
            self.state = create_train_state(
                lambda r: init_lora_params(cfg.model, cfg.lora, r),
                self.tx, init_rng,
            )
            if cfg.lora.path:
                state, _, _ = CheckpointManager(cfg.lora.path).restore(self.state)
                if state is not None:
                    self.state = state
            self._merge = jax.jit(
                lambda base, lora: merge_lora(base, lora, cfg.lora)
            )
        else:
            self.base_params = None
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
        self.critic_ckpt = (
            CheckpointManager(cfg.runner.checkpoint_dir + "_critic")
            if cfg.runner.checkpoint_dir and self.separate_critic
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
                if self.critic_ckpt is not None:
                    cstate, _, _ = self.critic_ckpt.restore(
                        self.critic_state, step=step
                    )
                    if cstate is not None:
                        self.critic_state = cstate

    # ------------------------------------------------------------------
    def rescale(self, new_mesh: jax.sharding.Mesh):
        """Online parallel-strategy switch: re-shard the live train state onto
        ``new_mesh`` and rebuild the mesh-bound phase fns (the TPU analog of
        Megatron online rescale, reference megatron_worker.py:1046
        apply_parallel_strategy / dynamic-scheduler GPU migration). Training
        resumes on the next step; flipping back to a previously used mesh
        reuses the jit cache."""
        from rlinf_tpu.training.train_state import rescale_train_state

        rules = M.partition_rules()
        if self.with_critic:
            from rlinf_tpu.models.llm.value_head import value_partition_rules

            rules = value_partition_rules() + rules
        self.state = rescale_train_state(self.state, new_mesh, rules)
        # the rng key is committed to the old mesh's devices; replicate it
        # onto the new mesh or the next split() sees mixed device sets
        self._rng = jax.device_put(
            self._rng,
            jax.sharding.NamedSharding(new_mesh, jax.sharding.PartitionSpec()))
        self.mesh = new_mesh
        if not self.with_critic:
            self.train_step = make_policy_train_step(
                self.cfg.model, self.cfg.loss, self.tx,
                num_microbatches=self.cfg.num_microbatches,
                remat=self.cfg.remat, attn_impl=self.cfg.attn_impl,
                mesh=new_mesh,
            )

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

    def _put_batch(self, arrays):
        """Host batch -> device, sharded over the data axes when a mesh is
        active (DP; reference per-component DP routing, CommMapper analog)."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in arrays.items()}
        from jax.sharding import PartitionSpec as P
        from rlinf_tpu.parallel.distributed import global_device_put
        from rlinf_tpu.parallel.mesh import AxisNames as Ax

        out = {}
        for k, v in arrays.items():
            spec = P(Ax.BATCH, *([None] * (np.ndim(v) - 1)))
            out[k] = global_device_put(v, self.mesh, spec)
        return out

    def _gae_token_advantages(self, train_batch, rewards):
        """Token-level GAE with a critic: sequence reward lands on the last
        response token; bootstrap is cut at that token (done). Reference
        semantics: GAE over response tokens with fp32 values
        (advantages.py:25 + critic worker)."""
        a = self.cfg.algorithm
        ids = jnp.asarray(train_batch.input_ids)
        amask = jnp.asarray(train_batch.attention_mask)
        values_bt = np.asarray(
            self._value_fn(self.state.params, ids, amask)
        )  # [B, T]
        lm = train_batch.loss_mask  # [B, T] bool
        B, T = lm.shape
        values_bt = values_bt * lm  # values outside the response don't matter

        # last valid loss position per row
        last_pos = T - 1 - np.argmax(lm[:, ::-1], axis=1)  # [B]
        has_any = lm.any(axis=1)
        rewards_tb = np.zeros((T, B), np.float32)
        rewards_tb[last_pos[has_any], np.nonzero(has_any)[0]] = rewards[has_any]
        dones_tb = np.zeros((T + 1, B), np.float32)
        dones_tb[last_pos[has_any] + 1, np.nonzero(has_any)[0]] = 1.0
        values_tb = np.concatenate(
            [values_bt.T, np.zeros((1, B), np.float32)], axis=0
        )

        gae = get_advantage_fn("gae")
        adv, ret = gae(
            rewards=jnp.asarray(rewards_tb),
            values=jnp.asarray(values_tb),
            dones=jnp.asarray(dones_tb),
            gamma=a.gamma,
            gae_lambda=a.gae_lambda,
            normalize_advantages=a.normalize_advantages,
            loss_mask=jnp.asarray(lm.T),
        )
        adv = np.asarray(adv).T * lm
        ret = np.asarray(ret).T * lm
        return {
            "advantages": adv.astype(np.float32),
            "returns": ret.astype(np.float32),
            "prev_values": values_bt.astype(np.float32),
        }

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

    def _policy_params(self):
        """Params the rollout/logprob phases see: merged base+adapters in
        LoRA mode, the train state otherwise."""
        if self.base_params is not None:
            return self._merge(self.base_params, self.state.params)
        return self.state.params

    def _augment_batch(self, batch_dict, result):
        """Hook for subclasses to add loss inputs (e.g. version stamps in
        disaggregated/async mode) before the recompute + train phases."""

    def run_step(self) -> Dict[str, float]:
        with self.timers.scope("rollout"):
            result = self._rollout_phase(self._policy_params())
        return self._train_on_result(result)

    def _train_on_result(self, result) -> Dict[str, float]:
        cfg = self.cfg
        step_start = time.perf_counter()

        # 2. rewards --------------------------------------------------------
        with self.timers.scope("reward"):
            texts = result.response_texts(self.tokenizer)
            rewards = np.asarray(
                self.reward_fn(texts, result.answers), np.float32
            )
            result.rewards = rewards

        # 3. advantages + batch assembly ------------------------------------
        if self.with_critic:
            train_batch = build_train_batch(
                result, np.zeros_like(result.response_logprobs),
                pad_id=cfg.sampling.pad_token_id,
            )
            extra = self._gae_token_advantages(train_batch, rewards)
            train_batch.advantages = extra["advantages"]
            batch_dict = self._put_batch(train_batch.to_dict())
            batch_dict["returns"] = self._put_batch(
                {"r": extra["returns"]})["r"]
            batch_dict["prev_values"] = self._put_batch(
                {"v": extra["prev_values"]})["v"]
        else:
            token_advantages = self._compute_advantages(result, rewards)
            train_batch = build_train_batch(
                result, token_advantages, pad_id=cfg.sampling.pad_token_id
            )
            batch_dict = self._put_batch(train_batch.to_dict())

        self._augment_batch(batch_dict, result)

        # 3b. optional fp32 logprob recompute (reference run_inference)
        if self.logprob_fn is not None:
            lp, _ = self.logprob_fn(self._policy_params(), batch_dict)
            lp = jnp.where(batch_dict["loss_mask"], lp, 0.0)
            if cfg.loss.loss_type == "decoupled":
                # decoupled PPO: behavior logprobs (from the rollout engine)
                # stay in old_logprobs; the recompute provides the PROXIMAL
                # anchor (reference losses.py:27)
                batch_dict["proximal_logprobs"] = lp
            else:
                batch_dict["old_logprobs"] = lp

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
                    elif self.separate_critic:
                        mb = {
                            k: v[jnp.asarray(mb_idx)]
                            for k, v in batch_dict.items()
                        }
                        self.critic_state, cmetrics = self.critic_step(
                            self.critic_state, mb
                        )
                        warm = cfg.algorithm.critic_warmup_steps
                        if self.global_step >= warm:
                            self.state, metrics = self.train_step(
                                self.state, mb
                            )
                        else:
                            # critic warmup: no actor update yet (reference
                            # critic_warmup semantics)
                            metrics = {"actor/warmup_skipped": jnp.float32(1)}
                        metrics = {**metrics, **cmetrics}
                    else:
                        mb = {
                            k: v[jnp.asarray(mb_idx)]
                            for k, v in batch_dict.items()
                        }
                        self.state, metrics = self.train_step(self.state, mb)
            host_sync(metrics)

        # 5. metrics / checkpoint ------------------------------------------
        self.global_step += 1
        out = {k: float(np.asarray(v)) for k, v in metrics.items()}
        out.update(
            rollout_metrics(
                result.response_lengths, rewards, cfg.sampling.max_new_tokens,
                prompt_lengths=result.prompt_lengths,
                advantages=train_batch.advantages,
                loss_mask=train_batch.loss_mask,
            )
        )
        times = self.timers.consume()
        out.update({f"time/{k}": v for k, v in times.items()})
        out["time/step"] = time.perf_counter() - step_start

        # perf accounting (reference FLOPs metrics, utils/flops.py:45 +
        # reasoning_runner.py:322-357)
        from rlinf_tpu.utils import flops as F

        gen_tokens = float(result.response_lengths.sum())
        train_tokens = float(train_batch.attention_mask.sum()) * cfg.runner.num_epochs
        if times.get("rollout"):
            out["perf/gen_tokens_per_s"] = gen_tokens / times["rollout"]
        if times.get("training"):
            out["perf/train_tokens_per_s"] = train_tokens / times["training"]
            tr_flops = 3.0 * F.model_matmul_flops_per_token(cfg.model) * train_tokens
            out["perf/train_tflops_per_s"] = tr_flops / times["training"] / 1e12
        out["perf/e2e_tokens_per_s"] = (gen_tokens + train_tokens) / out["time/step"]
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
            if self.critic_ckpt is not None:
                self.critic_ckpt.save(self.global_step, self.critic_state)
        return out

    def _rollout_phase(self, params):
        examples = self.iterator.next_batch()
        request = self._make_request(examples)
        return self.engine.rollout(params, request, self._next_rng(), mesh=self.mesh)

    def run_pipelined(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        """Overlap rollout of batch N+1 with training on batch N (reference
        pipelined mode, megatron_worker.py:808 run_training_pipeline /
        runner.is_pipeline). Behavior logprobs recorded at generation time
        keep the PPO ratios correct under the one-step staleness."""
        import concurrent.futures

        n = max_steps or self.cfg.runner.max_steps
        history: List[Dict[str, float]] = []
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        try:
            params_copy = jax.tree_util.tree_map(jnp.copy, self._policy_params())
            future = pool.submit(self._rollout_phase, params_copy)
            while self.global_step < n:
                result = future.result()
                if self.global_step + 1 < n:
                    # next rollout uses a snapshot (train step donates state)
                    params_copy = jax.tree_util.tree_map(
                        jnp.copy, self._policy_params()
                    )
                    future = pool.submit(self._rollout_phase, params_copy)
                history.append(self._train_on_result(result))
        finally:
            pool.shutdown(wait=False)
        return history

    def run(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        n = max_steps or self.cfg.runner.max_steps
        history = []
        while self.global_step < n:
            history.append(self.run_step())
        return history
