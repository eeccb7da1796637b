"""Real-simulator embodied PPO proof (BASELINE config 2 nearest runnable
analog): PPO on gymnasium Pendulum-v1 through the real adapter + EnvLoop path.

The reference's BASELINE config 2 is ManiSkill3 PickCube with 256 envs
(reference rlinf/envs/maniskill/maniskill_env.py:45). ManiSkill/LIBERO are not
installable in this image (zero egress), so gymnasium — a real external
simulator package, not a toy in-repo env — stands in, exactly as VERDICT.md
round-1 item 10 prescribes. The full embodied stack is exercised: registered
VectorEnv adapter -> stage-pipelined EnvLoop -> GAE -> PPO actor-critic
update, with the learning curve stored as a parity baseline
(reference tests/parity_tests/compare_baseline.py method).

Success criterion: mean episode return rises from random-policy level
(~ -1200) above -500 (Pendulum's "swung up and holding" regime).

Usage: python examples/embodiment/train_ppo_gym.py [--steps N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

if os.environ.get("RLINF_FORCE_CPU"):  # dev smoke runs; sitecustomize pins TPU
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--stages", type=int, default=2)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--log-dir", default="logs/ppo_gym_pendulum")
    args = parser.parse_args()

    from rlinf_tpu.envs.adapters import GymVectorEnv
    from rlinf_tpu.models.embodiment import MLPGaussianPolicy
    from rlinf_tpu.runners.embodied_runner import (
        EmbodiedRunner, EmbodiedRunnerConfig,
    )
    from rlinf_tpu.training.train_state import OptimizerConfig
    from rlinf_tpu.utils import parity

    per_stage = args.num_envs // args.stages
    runner = EmbodiedRunner(
        EmbodiedRunnerConfig(
            num_chunk_steps=64, num_epochs=4, num_mini_batches=8,
            gamma=0.9, gae_lambda=0.95, max_steps=args.steps,
            log_dir=args.log_dir,
        ),
        envs=[
            GymVectorEnv(per_stage, seed=s, env_id="Pendulum-v1")
            for s in range(args.stages)
        ],
        policy=MLPGaussianPolicy(obs_dim=3, action_dim=1, init_logstd=0.0),
        optimizer=OptimizerConfig(lr=1e-3, clip_grad=1.0),
    )
    history = runner.run()

    returns = [h["env/episode_return"] for h in history
               if "env/episode_return" in h]
    if not returns:  # no episode finished (smoke runs) — nothing to claim
        print(json.dumps({"improved": False, "solved": False,
                          "note": "no completed episodes"}))
        return
    k = max(3, len(returns) // 10)
    first, last = sum(returns[:k]) / k, sum(returns[-k:]) / k
    os.makedirs(args.log_dir, exist_ok=True)
    parity.save_baseline(
        os.path.join(args.log_dir, "baseline_return.json"), returns,
        meta={"task": "gym_pendulum_ppo", "metric": "env/episode_return",
              "num_envs": args.num_envs, "steps": args.steps},
    )
    summary = {"return_first": first, "return_last": last,
               "improved": last > first + 100.0, "solved": last > -500.0}
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
