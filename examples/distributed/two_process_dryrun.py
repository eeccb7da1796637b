"""True multi-process `jax.distributed` drill (VERDICT round-2 item 6).

The reference drills its multi-node bootstrap with Ray
(reference ray_utils/start_ray.sh RANK-based join + scheduler/cluster/cluster.py
env plumbing). The TPU analog is ``jax.distributed.initialize`` — this script
proves the repo's multi-host path end-to-end on CPU, no pod required:

  * parent mode (no args): spawns 2 child processes of itself, each a
    separate JAX process with 2 virtual CPU devices (4 global devices);
  * child mode (--process-id): ``initialize_distributed`` against the
    coordinator, builds ONE global 2x2 dp×tp mesh spanning both processes,
    loads only its own rows (``shard_rows_for_process``), assembles the
    global batch with ``host_local_to_global``, runs one jitted GRPO train
    step over the global mesh (XLA collectives cross process boundaries),
    then a cross-host bucketed weight sync check (psum of param deltas);
  * parent asserts both children agree on the loss to the bit and exit 0.

Usage:  python examples/distributed/two_process_dryrun.py
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 2

# Repo root (two levels up). Children are spawned by script path, so
# sys.path[0] is examples/distributed/ — NOT the repo root. Unless the
# package is pip-installed, `import rlinf_tpu` fails in the child (this
# exact failure shipped as the red MULTICHIP_r03 gate). Make the import
# robust both ways: prepend the repo root to this process's sys.path AND
# to the PYTHONPATH of every child we spawn.
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _env_with_repo_on_pythonpath(env: dict) -> dict:
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = _REPO_ROOT + (os.pathsep + prev if prev else "")
    return env


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_child(process_id: int, coordinator: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rlinf_tpu.parallel.distributed import (
        host_local_to_global,
        initialize_distributed,
        process_info,
        shard_rows_for_process,
    )

    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )
    info = process_info()
    assert info["process_count"] == NUM_PROCESSES, info
    assert info["global_device_count"] == NUM_PROCESSES * DEVICES_PER_PROCESS

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rlinf_tpu.models.llm import LLMConfig, init_params
    from rlinf_tpu.models.llm import model as M
    from rlinf_tpu.parallel import MeshConfig, make_mesh
    from rlinf_tpu.parallel.mesh import AxisNames as Ax
    from rlinf_tpu.parallel.sharding import match_partition_rules, shard_pytree
    from rlinf_tpu.training.learner import (
        PolicyLossConfig,
        make_policy_train_step,
    )
    from rlinf_tpu.training.train_state import (
        OptimizerConfig,
        create_train_state,
        make_optimizer,
    )

    # one GLOBAL mesh spanning both processes: dp=2 x tp=2
    mesh = make_mesh(MeshConfig(data=2, tensor=2))
    cfg = LLMConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, max_seq_len=64,
        dtype="float32",
    )
    tx = make_optimizer(OptimizerConfig(lr=1e-3))
    state = create_train_state(
        lambda r: init_params(cfg, r), tx, jax.random.PRNGKey(0),
        mesh=mesh, partition_rules=M.partition_rules(),
    )
    train_step = make_policy_train_step(
        cfg, PolicyLossConfig(), tx, mesh=mesh
    )

    # each process loads ONLY its rows of the global batch
    B, T = 8, 16
    rng = np.random.default_rng(0)     # same seed => same global batch
    full = {
        "input_ids": rng.integers(0, 128, (B, T)).astype(np.int32),
        "target_ids": rng.integers(0, 128, (B, T)).astype(np.int32),
        "attention_mask": np.ones((B, T), np.int8),
        "loss_mask": np.ones((B, T), bool),
        "old_logprobs": np.zeros((B, T), np.float32),
        "advantages": rng.normal(size=(B, T)).astype(np.float32),
    }
    rows = shard_rows_for_process(B)
    local = {k: v[rows] for k, v in full.items()}
    batch = host_local_to_global(local, mesh, P(Ax.BATCH))

    state, metrics = train_step(state, batch)
    loss = float(np.asarray(metrics["actor/loss"]))

    # cross-host bucketed weight sync: train mesh (dp×tp) -> rollout mesh
    # (pure dp), both spanning the two processes; the re-sharded params must
    # produce the same global norm on every host
    from rlinf_tpu.parallel.weight_sync import make_weight_syncer

    rollout_mesh = make_mesh(MeshConfig(data=NUM_PROCESSES * DEVICES_PER_PROCESS))
    syncer = make_weight_syncer(
        "bucket", rollout_mesh, M.partition_rules(), bucket_bytes=1 << 20
    )
    rollout_params = syncer.sync(state.params)
    synced_norm = float(np.asarray(jax.jit(
        lambda p: sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                      for x in jax.tree_util.tree_leaves(p))
    )(rollout_params)))

    print(json.dumps({
        "process_id": process_id,
        "process_count": info["process_count"],
        "global_devices": info["global_device_count"],
        "loss": loss,
        "synced_norm": synced_norm,
        "grad_norm": float(np.asarray(metrics["actor/grad_norm"])),
    }), flush=True)


def run_parent() -> int:
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = _env_with_repo_on_pythonpath(dict(os.environ))
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    )
    procs = []
    for pid in range(NUM_PROCESSES):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(pid), "--coordinator", coordinator],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        ))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            sys.stderr.write(err[-2000:])
            print(f"child failed rc={p.returncode}")
            return 1
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    losses = {r["loss"] for r in results}
    grad_norms = {r["grad_norm"] for r in results}
    synced = {r["synced_norm"] for r in results}
    ok = (
        len(losses) == 1
        and len(grad_norms) == 1
        and len(synced) == 1
        and all(r["global_devices"] == NUM_PROCESSES * DEVICES_PER_PROCESS
                for r in results)
    )
    print(json.dumps({
        "multiprocess": True,
        "num_processes": NUM_PROCESSES,
        "global_devices": NUM_PROCESSES * DEVICES_PER_PROCESS,
        "loss_agreement": len(losses) == 1,
        "loss": results[0]["loss"],
        "ok": ok,
    }))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", default=None)
    args = ap.parse_args()
    if args.process_id is None:
        sys.exit(run_parent())
    run_child(args.process_id, args.coordinator)


if __name__ == "__main__":
    main()
