"""Multi-process ReasoningRunner GRPO drill (VERDICT round-3 item 2).

Grows the two-process train-step drill into a full multi-process TRAINING
RUN: N ``jax.distributed`` processes (2 virtual CPU devices each) drive the
SAME ``ReasoningRunner`` over one global dp×tp mesh —

  * host-sharded input: each host materializes only its addressable shards
    of every batch (``global_device_put``), rollout results are allgathered
    (``fetch_global``);
  * per-step weight "sync": the sharded params pytree flows from the train
    step into the rollout engine on the same global mesh;
  * phase A: 3 GRPO steps with per-step orbax checkpointing (all hosts
    participate in the save);
  * the process tree is then torn down (the "kill");
  * phase B: fresh processes resume from the checkpoint (runner.resume=auto,
    dataloader state restored) and train 2 more steps;
  * the parent asserts per-step losses are BIT-IDENTICAL across hosts in
    both phases and that phase B resumed from phase A's last saved step.

Reference analog: a multi-node training run through
rlinf/runners/reasoning_runner.py:431 after the ray_utils/start_ray.sh
bootstrap — not just one step.

Usage: python examples/distributed/multiprocess_runner_drill.py [--num-processes 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile

DEVICES_PER_PROCESS = 2

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_child(
    process_id: int, coordinator: str, num_processes: int,
    ckpt_dir: str, max_steps: int,
) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rlinf_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np

    from rlinf_tpu.config import (
        AlgorithmConfig, RunnerConfig, TrainerConfig,
    )
    from rlinf_tpu.data.datasets import PromptDataset, PromptExample
    from rlinf_tpu.data.tokenizers import ByteTokenizer
    from rlinf_tpu.models.llm.config import LLMConfig
    from rlinf_tpu.models.llm.sampler import SamplingParams
    from rlinf_tpu.parallel import MeshConfig, make_mesh
    from rlinf_tpu.runners.reasoning_runner import ReasoningRunner
    from rlinf_tpu.training.learner import PolicyLossConfig
    from rlinf_tpu.training.train_state import OptimizerConfig

    mesh = make_mesh(MeshConfig(data=-1, tensor=2))

    cfg = TrainerConfig(
        model=LLMConfig(
            vocab_size=258, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=2, num_kv_heads=2, max_seq_len=128,
            dtype="float32", qkv_bias=False, rope_theta=1e4,
        ),
        sampling=SamplingParams(
            max_new_tokens=8, temperature=1.0, eos_token_id=-1,
            pad_token_id=0,
        ),
        optimizer=OptimizerConfig(lr=5e-3, clip_grad=1.0),
        loss=PolicyLossConfig(clip_ratio_low=0.2, clip_ratio_high=0.2),
        algorithm=AlgorithmConfig(adv_type="grpo", group_size=4),
        runner=RunnerConfig(
            rollout_batch_size=4, max_steps=max_steps, seed=0,
            checkpoint_dir=ckpt_dir, save_interval=2, resume="auto",
        ),
    )
    dataset = PromptDataset(
        [PromptExample(f"question {i}:", "unused") for i in range(16)]
    )

    def reward_fn(texts, answers):
        return [
            (sum(c == "a" for c in t) / max(len(t), 1)) if t else 0.0
            for t in texts
        ]

    runner = ReasoningRunner(
        cfg, ByteTokenizer(), dataset, mesh=mesh, reward_fn=reward_fn
    )
    start_step = runner.global_step
    history = runner.run()
    print(json.dumps({
        "process_id": process_id,
        "start_step": start_step,
        "end_step": runner.global_step,
        "losses": [h["actor/loss"] for h in history],
        "rewards": [h["rollout/reward_mean"] for h in history],
    }), flush=True)


def _spawn_phase(
    num_processes: int, ckpt_dir: str, max_steps: int,
) -> list:
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + prev if prev else "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(pid), "--coordinator", coordinator,
             "--num-processes", str(num_processes),
             "--ckpt-dir", ckpt_dir, "--max-steps", str(max_steps)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(num_processes)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=270)
        if p.returncode != 0:
            sys.stderr.write(err[-3000:])
            raise SystemExit(f"child failed rc={p.returncode}")
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    return results


def run_parent(num_processes: int) -> int:
    ckpt_dir = tempfile.mkdtemp(prefix="mp_runner_drill_")
    try:
        # Phase A: fresh training run, 3 steps, checkpoint at step 2.
        a = _spawn_phase(num_processes, ckpt_dir, max_steps=3)
        assert all(r["start_step"] == 0 for r in a), a
        assert all(r["end_step"] == 3 for r in a), a
        loss_sets = [set(ls) for ls in zip(*(r["losses"] for r in a))]
        assert all(len(s) == 1 for s in loss_sets), (
            f"per-step losses differ across hosts: {a}"
        )
        # Phase B ("kill" happened: phase-A processes are gone): resume from
        # the step-2 checkpoint and continue to step 5.
        b = _spawn_phase(num_processes, ckpt_dir, max_steps=5)
        assert all(r["start_step"] == 2 for r in b), (
            f"resume did not pick up the checkpoint: {b}"
        )
        assert all(r["end_step"] == 5 for r in b), b
        loss_sets_b = [set(ls) for ls in zip(*(r["losses"] for r in b))]
        assert all(len(s) == 1 for s in loss_sets_b), (
            f"post-resume losses differ across hosts: {b}"
        )
        print(json.dumps({
            "multiprocess_runner": True,
            "num_processes": num_processes,
            "phase_a_losses": a[0]["losses"],
            "resume_start_step": b[0]["start_step"],
            "phase_b_losses": b[0]["losses"],
            "ok": True,
        }))
        return 0
    finally:
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--max-steps", type=int, default=3)
    args = ap.parse_args()
    if args.process_id is None:
        sys.exit(run_parent(args.num_processes))
    run_child(
        args.process_id, args.coordinator, args.num_processes,
        args.ckpt_dir, args.max_steps,
    )


if __name__ == "__main__":
    main()
