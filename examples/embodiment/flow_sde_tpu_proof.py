"""Flow-SDE PPO (πRL recipe) learning proof ON THE TPU chip.

Reference analog: πRL — RL over the π₀/π₀.₅ flow-matching denoising chain
(reference docs pi_rl.rst: flow-SDE turns the deterministic ODE sampler into
a stochastic MDP whose per-step Gaussian logprobs support PPO; ManiSkill
38.4→78.8%). Here the same algorithm — sample_sde chains in `actions`,
chain_logprobs ratios, GAE — trains the in-tree FlowMatchingPolicy on
point_reach, on the real chip.

Usage: python examples/embodiment/flow_sde_tpu_proof.py [--steps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--log-dir", default="logs/flow_sde_tpu_proof")
    args = ap.parse_args()

    import numpy as np
    import jax

    from rlinf_tpu.envs.toy import PointReachEnv
    from rlinf_tpu.models.embodiment.flow_policy import FlowMatchingPolicy
    from rlinf_tpu.runners.embodied_runner import (
        EmbodiedRunner, EmbodiedRunnerConfig,
    )
    from rlinf_tpu.training.train_state import OptimizerConfig
    from rlinf_tpu.utils import parity

    os.makedirs(args.log_dir, exist_ok=True)
    print(f"[flow] backend={jax.default_backend()}", flush=True)

    env = PointReachEnv(num_envs=128, seed=0, max_episode_steps=12,
                        goal_radius=0.35, dt=0.3)
    policy = FlowMatchingPolicy(
        obs_dim=4, action_dim=2, hidden_sizes=(128, 128), num_flow_steps=4,
        sde_noise_scale=0.7,
    )
    cfg = EmbodiedRunnerConfig(
        num_chunk_steps=12, num_epochs=2, num_mini_batches=4,
        gamma=0.9, gae_lambda=0.95, max_steps=args.steps, seed=0,
        log_dir=args.log_dir,
    )
    runner = EmbodiedRunner(
        cfg, [env], policy,
        optimizer=OptimizerConfig(lr=3e-3, clip_grad=1.0),
    )
    t0 = time.perf_counter()
    hist = runner.run(max_steps=args.steps)
    dt = time.perf_counter() - t0

    succ = [h.get("env/success_once", 0.0) for h in hist]
    k = max(5, len(succ) // 10)
    first, last = float(np.mean(succ[:k])), float(np.mean(succ[-k:]))
    print(f"[flow] {len(succ)} steps in {dt:.1f}s  "
          f"success {first:.3f} -> {last:.3f}", flush=True)

    parity.save_baseline(
        os.path.join(args.log_dir, "baseline_success.json"), succ,
        meta={"task": "flow_sde_point_reach_tpu",
              "metric": "env/success_once", "steps": args.steps,
              "backend": jax.default_backend()},
    )
    summary = {
        "success_first": first, "success_last": last,
        "improved": last > first + 0.1, "seconds": dt,
        "backend": jax.default_backend(),
    }
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
