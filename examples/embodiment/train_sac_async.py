"""Async SAC actor-learner on built-in envs (the AsyncEmbodiedRunner /
replay-buffer path; reference async_embodied_runner.py analog)."""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="point_reach")
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--log-dir", default="logs/sac_async")
    args = parser.parse_args()

    from rlinf_tpu.envs import get_env_cls
    from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
    from rlinf_tpu.runners.async_embodied_runner import (
        AsyncEmbodiedRunner, AsyncRunnerConfig,
    )

    Env = get_env_cls(args.env)
    env = Env(num_envs=args.num_envs, seed=0)
    obs_dim = env.obs_spec["states"][0]
    runner = AsyncEmbodiedRunner(
        AsyncRunnerConfig(
            total_train_steps=args.steps, log_dir=args.log_dir,
        ),
        envs=[env],
        policy=MLPSACPolicy(obs_dim=obs_dim, action_dim=env.action_dim),
    )
    runner.run()
    print(runner.evaluate(Env(num_envs=64, seed=123)))


if __name__ == "__main__":
    main()
