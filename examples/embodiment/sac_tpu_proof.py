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

    runner = AsyncEmbodiedRunner(
        AsyncRunnerConfig(
            total_train_steps=args.steps, rollout_chunk_steps=4,
            log_dir=args.log_dir,
        ),
        envs=[BanditEnv(num_envs=32, seed=0)],
        policy=MLPSACPolicy(obs_dim=2, action_dim=2),
    )
    t0 = time.perf_counter()
    hist = runner.run()
    dt = time.perf_counter() - t0

    rets = [h["env/episode_return"] for h in hist
            if "env/episode_return" in h]
    k = max(3, len(rets) // 8)
    first, last = float(np.mean(rets[:k])), float(np.mean(rets[-k:]))
    ev = runner.evaluate(BanditEnv(num_envs=64, seed=123), num_steps=4)
    eval_ret = float(ev.get("eval/env/episode_return", -99))
    print(f"[sac] {args.steps} learner steps in {dt:.1f}s  "
          f"return {first:.3f} -> {last:.3f}  eval {eval_ret:.3f}", flush=True)

    parity.save_baseline(
        os.path.join(args.log_dir, "baseline_return.json"), rets,
        meta={"task": "sac_bandit_tpu", "metric": "env/episode_return",
              "steps": args.steps, "backend": jax.default_backend()},
    )
    summary = {
        "return_first": first, "return_last": last,
        "eval_return": eval_ret,
        "improved": last > first + 0.1 and eval_ret > -0.2,
        "seconds": dt, "backend": jax.default_backend(),
    }
    with open(os.path.join(args.log_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
