"""Online parallel-strategy switch on a live ReasoningRunner: train on a
4-chip submesh, rescale to all 8 chips (and back), keep training.

Reference analog: MegatronWorker.apply_parallel_strategy
(megatron_worker.py:1046) driven by the dynamic scheduler's ActorManager
("parallel strategy adjustment TP/PP/DP", guides/dynamic_scheduling.rst).
"""

import numpy as np
import jax

from rlinf_tpu.config import AlgorithmConfig, RunnerConfig, TrainerConfig
from rlinf_tpu.data.datasets import PromptDataset, PromptExample
from rlinf_tpu.data.tokenizers import ByteTokenizer
from rlinf_tpu.models.llm.config import LLMConfig
from rlinf_tpu.models.llm.sampler import SamplingParams
from rlinf_tpu.parallel import MeshConfig, make_mesh
from rlinf_tpu.runners.reasoning_runner import ReasoningRunner
from rlinf_tpu.training.train_state import OptimizerConfig


def _reward(texts, answers):
    return [sum(c == "a" for c in t) / max(len(t), 1) for t in texts]


def _mesh(devices, start, count, tp):
    return make_mesh(MeshConfig(data=-1, tensor=tp),
                     devices[start:start + count])


def test_runner_rescale_mid_training(devices):
    cfg = TrainerConfig(
        model=LLMConfig(
            vocab_size=256, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, num_kv_heads=2, max_seq_len=128,
            dtype="float32", qkv_bias=False, rope_theta=1e4,
        ),
        sampling=SamplingParams(max_new_tokens=8, eos_token_id=-1),
        optimizer=OptimizerConfig(lr=5e-3),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=8),
        runner=RunnerConfig(rollout_batch_size=8, max_steps=100, seed=0),
    )
    dataset = PromptDataset([PromptExample(f"q{i}:", "x") for i in range(16)])

    mesh_small = _mesh(devices, 0, 4, tp=2)
    mesh_big = _mesh(devices, 0, 8, tp=2)

    with jax.set_mesh(mesh_small):
        runner = ReasoningRunner(
            cfg, ByteTokenizer(), dataset, mesh=mesh_small,
            reward_fn=_reward)
        hist = [runner.run_step() for _ in range(2)]
        assert {d.id for d in
                runner.state.params["embed"].sharding.device_set} == {0, 1, 2, 3}

    # grow 4 -> 8 chips mid-run
    with jax.set_mesh(mesh_big):
        runner.rescale(mesh_big)
        assert {d.id for d in
                runner.state.params["embed"].sharding.device_set} == set(range(8))
        hist += [runner.run_step() for _ in range(2)]

    # shrink back 8 -> 4 (jit cache reuse path)
    with jax.set_mesh(mesh_small):
        runner.rescale(mesh_small)
        hist += [runner.run_step() for _ in range(2)]

    assert runner.global_step == 6
    assert all(np.isfinite(h["actor/loss"]) for h in hist)
    assert int(np.asarray(runner.state.step)) == 6
