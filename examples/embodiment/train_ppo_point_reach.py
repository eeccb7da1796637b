"""Embodied PPO on the built-in PointReach env (BASELINE config 2 analog:
vectorized envs + Gaussian policy + GAE PPO; swap in a real simulator by
registering its VectorEnv adapter)."""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--num-envs", type=int, default=256)
    parser.add_argument("--stages", type=int, default=2)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--log-dir", default="logs/ppo_point_reach")
    args = parser.parse_args()

    from rlinf_tpu.envs import get_env_cls
    from rlinf_tpu.models.embodiment import MLPGaussianPolicy
    from rlinf_tpu.runners.embodied_runner import (
        EmbodiedRunner, EmbodiedRunnerConfig,
    )
    from rlinf_tpu.training.train_state import OptimizerConfig

    Env = get_env_cls("point_reach")
    per_stage = args.num_envs // args.stages
    runner = EmbodiedRunner(
        EmbodiedRunnerConfig(
            num_chunk_steps=32, num_epochs=2, num_mini_batches=4,
            gamma=0.9, gae_lambda=0.95, max_steps=args.steps,
            eval_interval=25, log_dir=args.log_dir,
        ),
        envs=[Env(num_envs=per_stage, seed=s) for s in range(args.stages)],
        policy=MLPGaussianPolicy(obs_dim=4, action_dim=2, init_logstd=-0.5),
        optimizer=OptimizerConfig(lr=3e-3, clip_grad=1.0),
        eval_envs=[Env(num_envs=64, seed=999)],
    )
    runner.run()


if __name__ == "__main__":
    main()
