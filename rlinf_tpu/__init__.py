"""rlinf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) actor-learner RL trainer.

A from-scratch re-design of the capabilities of RLinf (reference:
/root/reference — Ray workers + NCCL p2p + Megatron/FSDP + SGLang/vLLM) as a
small number of multi-host JAX programs over a device mesh:

  * components (env, rollout, learner, reward) are mesh regions + jitted
    functions, not processes;
  * channels become in-program queues / host-side ring buffers;
  * weight resync between learner and rollout shards is a resharding
    ``device_put`` / all-gather over ICI, not an object-store transfer;
  * hot paths (generation, logprob recompute, fused losses, attention) are
    Pallas/XLA kernels.

Layer map (mirrors SURVEY.md §1 of the reference, re-drawn TPU-first):

  parallel/    mesh + component placement + sharding rules (replaces
               rlinf/scheduler Ray fabric, reference cluster/cluster.py)
  ops/         Pallas/XLA kernels (attention, fused logprob/entropy, rmsnorm)
  models/      LLM decoder + embodied policies (replaces rlinf/models)
  algorithms/  advantages / losses / rewards registries (rlinf/algorithms)
  data/        rollout batch structs, datasets, replay buffer (rlinf/data)
  envs/        vectorized host envs (rlinf/envs)
  rollout/     on-device autoregressive generation engine (replaces
               SGLang/vLLM embedding, rlinf/hybrid_engines/sglang)
  training/    sharded train state + jitted update steps (replaces
               Megatron/FSDP model managers, rlinf/hybrid_engines/megatron)
  runners/     driver loops (rlinf/runners)
  utils/       metrics, timers, checkpointing, flops accounting (rlinf/utils)
"""

__version__ = "0.1.0"
