"""Async SAC learning proof ON THE TPU chip (round-2 weak #8: SAC had zero
TPU exposure). Bandit env (the fastest SAC learnability check, same config
as tests/test_sac_async.py): episode return must rise toward 0 (reward is
-||a - target||^2) and the evaluated policy must be near-optimal.

Usage: python examples/embodiment/sac_tpu_proof.py [--steps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--log-dir", default="logs/sac_tpu_proof")
    args = ap.parse_args()

    import numpy as np
    import jax

    from rlinf_tpu.envs.toy import BanditEnv
    from rlinf_tpu.models.embodiment.sac_policy import MLPSACPolicy
    from rlinf_tpu.runners.async_embodied_runner import (
        AsyncEmbodiedRunner, AsyncRunnerConfig,
    )
    from rlinf_tpu.utils import parity

    os.makedirs(args.log_dir, exist_ok=True)
    print(f"[sac] backend={jax.default_backend()}", flush=True)

    from rlinf_tpu.training.sac_learner import SACConfig

    runner = AsyncEmbodiedRunner(
        AsyncRunnerConfig(
            total_train_steps=args.steps, rollout_chunk_steps=4,
            train_batch_size=128, warmup_transitions=256,
            weight_sync_interval=5, updates_per_chunk=4.0,
            replay_capacity=200, seed=0, log_dir=args.log_dir,
        ),
        envs=[BanditEnv(num_envs=32, seed=0)],
        policy=MLPSACPolicy(obs_dim=2, action_dim=2, hidden_sizes=(64, 64)),
        sac=SACConfig(gamma=0.0, learn_alpha=True),  # bandit: no bootstrap
    )
    t0 = time.perf_counter()
    hist = runner.run()
    dt = time.perf_counter() - t0

    # bandit episodes are 1-step; grade the DETERMINISTIC policy directly:
    # reward = -||a - target||^2, so near-0 mean reward == solved (an
    # untrained policy scores ~ -0.9 on this env).
    def mean_reward(params):
        env = BanditEnv(num_envs=256, seed=123)
        obs = env.reset()
        out = runner.policy.predict_action_batch(
            params, jax.random.PRNGKey(0),
            {k: jax.numpy.asarray(v) for k, v in obs.items()},
            deterministic=True,
        )
        step = env.step(np.asarray(runner.policy.env_actions(out.actions)))
        return float(np.mean(step.reward))

    eval_ret = mean_reward(runner.state.params)
    # run() returns the FINAL metrics dict (async runner); curve comes from
    # the jsonl log
    q1 = [float(hist.get("sac/q1_mean", 0.0))] if isinstance(hist, dict) \
        else [h["sac/q1_mean"] for h in hist if "sac/q1_mean" in h]
    print(f"[sac] {args.steps} learner steps in {dt:.1f}s  "
          f"eval mean reward {eval_ret:.4f}", flush=True)

    parity.save_baseline(
        os.path.join(args.log_dir, "baseline_q1.json"), q1,
        meta={"task": "sac_bandit_tpu", "metric": "sac/q1_mean",
              "steps": args.steps, "backend": jax.default_backend()},
    )
    summary = {
        "eval_mean_reward": eval_ret,
        "improved": eval_ret > -0.2,
        "seconds": dt, "backend": jax.default_backend(),
    }
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
