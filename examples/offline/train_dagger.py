"""DAgger on PointReach with an analytic expert.

Run: python examples/offline/train_dagger.py
Reference analog: the DAgger e2e configs (fsdp_dagger_policy_worker).
"""

import numpy as np

from rlinf_tpu.envs.toy import PointReachEnv
from rlinf_tpu.models.embodiment.mlp_policy import MLPGaussianPolicy
from rlinf_tpu.runners.dagger_runner import DAggerRunner, DAggerRunnerConfig


def main():
    env = PointReachEnv(num_envs=128, seed=0)
    policy = MLPGaussianPolicy(obs_dim=4, action_dim=2, hidden_sizes=(64, 64))

    def expert(obs):
        s = obs["states"]
        return np.clip((s[:, 2:] - s[:, :2]) / env.dt, -1.0, 1.0)

    cfg = DAggerRunnerConfig(num_iterations=6, rollout_steps=64,
                             updates_per_iteration=200, batch_size=512,
                             log_dir="logs/dagger_demo")
    runner = DAggerRunner(cfg, env, policy, expert)
    for m in runner.run():
        pass
    print("final:", {k: round(v, 3) for k, v in m.items()})


if __name__ == "__main__":
    main()
