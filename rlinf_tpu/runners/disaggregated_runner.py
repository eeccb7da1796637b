"""Disaggregated reasoning RL: learner and rollout on disjoint submeshes.

TPU-native analog of the reference's disaggregated placement mode
(reference rlinf/utils/placement.py:28 DISAGGREGATED;
rlinf/workers/actor/megatron_actor_worker.py:308-424 sync_model_to_rollout
over NCCL p2p while rollout continues; rlinf/runners/async_embodied_runner.py
:157-203 non-blocking weight updates):

  * the train state lives on the ACTOR submesh (DP/TP shardings);
  * generation runs on the ROLLOUT submesh against a version-stamped param
    copy, OVERLAPPED with training via a background thread — train step N
    runs while batch N+1 generates;
  * weight sync between submeshes goes through parallel/weight_sync.py
    (full resharding transfer, bucketed, or delta-patch codecs — the
    reference's weight_syncer/ strategies) every ``sync_interval`` learner
    steps;
  * the one-step (or more) policy lag is corrected by the decoupled-PPO
    loss keyed on version stamps (reference losses.py:27), with the
    proximal anchor recomputed on the actor mesh.

Collocated mode stays in ReasoningRunner, where weight "sync" is the param
pytree flowing between phases; this runner exists exactly for the case
where rollout and training hardware are separate.
"""

from __future__ import annotations

import concurrent.futures
from typing import Dict, List, Optional

import jax
import numpy as np

from rlinf_tpu.config import TrainerConfig
from rlinf_tpu.models.llm import model as M
from rlinf_tpu.parallel.mesh import ComponentPlacement, PlacementMode
from rlinf_tpu.parallel.weight_sync import make_weight_syncer
from rlinf_tpu.runners.reasoning_runner import ReasoningRunner


class DisaggregatedReasoningRunner(ReasoningRunner):
    def __init__(
        self,
        cfg: TrainerConfig,
        tokenizer,
        dataset,
        *,
        placement: ComponentPlacement,
        reward_fn=None,
        syncer: str = "bucket",
        syncer_kwargs: Optional[dict] = None,
        sync_interval: int = 1,
    ):
        if placement.mode != PlacementMode.DISAGGREGATED:
            raise ValueError(
                f"placement mode is {placement.mode}, expected DISAGGREGATED "
                "(use ReasoningRunner for collocated/hybrid)"
            )
        if cfg.loss.loss_type != "decoupled":
            raise ValueError(
                "disaggregated mode trains against stale rollouts; set "
                "loss.loss_type=decoupled (reference async semantics)"
            )
        self.placement = placement
        self.rollout_mesh = placement.mesh("rollout")
        actor_mesh = placement.mesh("actor")
        super().__init__(
            cfg, tokenizer, dataset, mesh=actor_mesh, reward_fn=reward_fn
        )
        self.syncer = make_weight_syncer(
            syncer, self.rollout_mesh, M.partition_rules(),
            **(syncer_kwargs or {}),
        )
        self.sync_interval = sync_interval
        # initial full sync: rollout params live on the rollout submesh
        self.rollout_params = self.syncer.sync(self._policy_params())
        self.param_version = 0
        self._behavior_version = 0

    # -- hooks ------------------------------------------------------------
    def _augment_batch(self, batch_dict, result):
        import jax.numpy as jnp

        B, T = batch_dict["loss_mask"].shape
        v = float(getattr(result, "version", self._behavior_version))
        batch_dict["versions"] = jnp.full((B, T), v, jnp.float32)
        batch_dict["current_version"] = jnp.full(
            (B,), float(self.param_version), jnp.float32
        )

    def _disagg_rollout(self):
        """Generate on the rollout submesh with the synced param copy."""
        examples = self.iterator.next_batch()
        request = self._make_request(examples)
        result = self.engine.rollout(
            self.rollout_params, request, self._next_rng(),
            mesh=self.rollout_mesh,
        )
        result.version = self.param_version
        return result

    def _sync_weights(self):
        """Actor -> rollout submesh transfer (reference sync_model_to_rollout
        + sync_hf_weight pipeline, megatron_actor_worker.py:330)."""
        self.rollout_params = self.syncer.sync(self._policy_params())
        self.param_version += 1

    # -- driver loop ------------------------------------------------------
    def run(self, max_steps: Optional[int] = None) -> List[Dict[str, float]]:
        """Overlapped loop: rollout batch N+1 generates on the rollout mesh
        while the actor mesh trains on batch N."""
        n = max_steps or self.cfg.runner.max_steps
        history: List[Dict[str, float]] = []
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        try:
            future = pool.submit(self._disagg_rollout)
            while self.global_step < n:
                result = future.result()
                if self.global_step + 1 < n:
                    future = pool.submit(self._disagg_rollout)
                self._behavior_version = getattr(
                    result, "version", self.param_version
                )
                metrics = self._train_on_result(result)
                metrics["disagg/version_lag"] = (
                    self.param_version - self._behavior_version
                )
                if self.global_step % self.sync_interval == 0:
                    with self.timers.scope("weight_sync"):
                        self._sync_weights()
                metrics["disagg/param_version"] = float(self.param_version)
                history.append(metrics)
        finally:
            pool.shutdown(wait=False)
        return history

    run_pipelined = run
