"""Online coding RL: server-mode rollout + sandboxed code-exec rewards.

TPU-native re-design of the reference's CodingOnlineRLRunner
(reference rlinf/runners/coding_online_rl_runner.py:39 — SGLang server +
router behind an actor/inference pipeline): here the rollout side is the
in-process ``GenerationServer`` (continuous batching engine + live weight
swap between decode chunks — the router-pause-free analog of the reference's
``_sync_weights`` with ``online_router.sync_model_start/end``), clients
submit coding prompts as futures, and rewards come from the sandboxed
code-execution verifier (algorithms/rewards/code_verifier.py, reference
rewards/code/code_verifier/verify.py).

Online semantics (reference asserts ``recompute_logprobs`` for online RL):
responses are generated under a stale param version while the learner moves;
the loss is decoupled-PPO keyed on version stamps, with the proximal anchor
recomputed on the training path (loss.loss_type="decoupled" +
ReasoningRunner's recompute pipeline).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rlinf_tpu.algorithms.rewards.code_verifier import batch_code_rewards
from rlinf_tpu.config import TrainerConfig
from rlinf_tpu.data.io_struct import RolloutRequest
from rlinf_tpu.rollout.continuous_engine import ContinuousBatchingEngine
from rlinf_tpu.rollout.server import GenerationServer
from rlinf_tpu.runners.reasoning_runner import ReasoningRunner


@dataclasses.dataclass(frozen=True)
class CodingTask:
    """One coding problem: prompt + I/O test cases
    (reference data convention: rewards/code/code_verifier inputs)."""

    prompt: str
    test_cases: Sequence[Dict[str, str]]  # [{"input": ..., "output": ...}]

    @property
    def answer(self):  # PromptExample-compatible
        return list(self.test_cases)


class CodingOnlineRunner(ReasoningRunner):
    """Server-mode online RL on coding tasks.

    Differences from the base runner:
      * generation goes through a continuously-serving ``GenerationServer``
        (requests as futures; weights swapped live between decode chunks);
      * each batch is version-stamped at submit time; training uses the
        decoupled-PPO loss (cfg.loss.loss_type must be "decoupled");
      * the default reward is the sandboxed code-exec verifier over the
        task's test cases.
    """

    def __init__(
        self,
        cfg: TrainerConfig,
        tokenizer,
        tasks: Sequence[CodingTask],
        *,
        reward_fn=None,
        partial_credit: bool = True,
        exec_timeout_s: float = 4.0,
    ):
        if cfg.loss.loss_type != "decoupled":
            raise ValueError(
                "online server rollout trains against live-swapped weights; "
                "set loss.loss_type=decoupled (reference coding_online_rl "
                "asserts recompute_logprobs)"
            )
        if reward_fn is None:
            def reward_fn(texts, answers):
                return batch_code_rewards(
                    texts, answers,
                    timeout_s=exec_timeout_s,
                    partial_credit=partial_credit,
                )

        from rlinf_tpu.data.datasets import PromptDataset, PromptExample

        dataset = PromptDataset(
            [PromptExample(t.prompt, t.answer) for t in tasks]
        )
        super().__init__(cfg, tokenizer, dataset, reward_fn=reward_fn)
        if not isinstance(self.engine, ContinuousBatchingEngine):
            raise ValueError(
                "coding online RL needs the continuous engine "
                "(cfg.rollout.engine='continuous' or 'auto' off-mesh)"
            )
        if self.logprob_fn is None:
            # Online RL must recompute the proximal anchor (reference
            # coding_online_rl_runner.py: "online rl must recompute
            # logprobs") even when the decode path is numerically identical
            # to training — the server swaps weights mid-stream.
            from rlinf_tpu.training.learner import make_logprob_fn

            self.recompute_logprobs = True
            # self.cfg (not the ctor arg): the base runner resolved
            # attn_impl='auto' to a concrete kernel there
            self.logprob_fn = make_logprob_fn(
                self.cfg.model,
                chunk_size=self.cfg.loss.logprob_chunk_size,
                attn_impl=self.cfg.attn_impl,
                temperature=self.cfg.sampling.temperature,
            )
        self.server = GenerationServer(
            self.engine, self._frozen_policy_params(),
            seed=cfg.runner.seed + 31337,
        )
        self.server.start()
        self.param_version = 0
        self._behavior_version = 0

    # ------------------------------------------------------------------
    def _frozen_policy_params(self):
        """Snapshot for the serving thread: the train step donates the state
        buffers, so the server must hold its own copy."""
        return jax.tree_util.tree_map(jnp.copy, self._policy_params())

    def _sync_weights(self):
        """Live weight swap (reference _sync_weights: router pause + actor
        sync_model_to_rollout + engine sync_hf_weight; here the server picks
        the new pytree up between decode chunks — no pause needed)."""
        self.server.update_params(self._frozen_policy_params())
        self.param_version += 1

    def _augment_batch(self, batch_dict, result):
        B, T = batch_dict["loss_mask"].shape
        v = float(getattr(result, "version", self._behavior_version))
        batch_dict["versions"] = jnp.full((B, T), v, jnp.float32)
        batch_dict["current_version"] = jnp.full(
            (B,), float(self.param_version), jnp.float32
        )

    # ------------------------------------------------------------------
    def _submit_batch(self):
        """Submit one rollout batch's prompts to the serving loop and return
        (request, futures, version) — the 'online clients' side."""
        examples = self.iterator.next_batch()
        request = self._make_request(examples)
        futures = [
            self.server.submit(p, self.cfg.sampling.max_new_tokens)
            for p in request.prompt_ids
        ]
        return request, futures, self.param_version

    def _collect(self, request: RolloutRequest, futures, version: int):
        tokens = []
        lps = []
        for f in futures:
            res = f.result(timeout=600.0)
            tokens.append(res["tokens"])
            lps.append(res["logprobs"])
        result = self.engine._pack_results(request, tokens, lps)
        result.version = version
        return result

    def _rollout_phase(self, params):
        request, futures, version = self._submit_batch()
        result = self._collect(request, futures, version)
        self._behavior_version = version
        return result

    # ------------------------------------------------------------------
    def run(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        """Overlapped online loop: batch N+1's requests stream through the
        server while the learner trains on batch N (the reference's
        continuously-running rollout service)."""
        n = max_steps or self.cfg.runner.max_steps
        history: List[Dict[str, float]] = []
        try:
            self._sync_weights()
            pending = self._submit_batch()
            while self.global_step < n:
                request, futures, version = pending
                with self.timers.scope("rollout"):
                    result = self._collect(request, futures, version)
                self._behavior_version = version
                if self.global_step + 1 < n:
                    pending = self._submit_batch()
                metrics = self._train_on_result(result)
                self._sync_weights()
                metrics["online/param_version"] = float(self.param_version)
                metrics["online/version_lag"] = float(
                    self.param_version - version
                )
                history.append(metrics)
        finally:
            self.server.stop()
        return history

    run_pipelined = run
