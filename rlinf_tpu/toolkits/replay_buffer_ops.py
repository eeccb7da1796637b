"""Replay-buffer maintenance: merge, split, and inspect persisted buffers.

Reference analog: toolkits/replay_buffer/merge_or_split_replay_buffer.py
(merge per-rank trajectory dirs into one, split one dir into N, normalize
the on-disk index). Operates on rlinf_tpu's ReplayBuffer disk layout
(data/replay_buffer.py): ``traj_XXXXXXXX.npz`` files (one trajectory each,
with a ``__weight__`` scalar) plus an ``index.json``.

CLI:
    python -m rlinf_tpu.toolkits.replay_buffer_ops info   DIR [DIR...]
    python -m rlinf_tpu.toolkits.replay_buffer_ops merge  --out OUT DIR [DIR...]
    python -m rlinf_tpu.toolkits.replay_buffer_ops split  --out-prefix P --num-splits N DIR
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from typing import Dict, List

import numpy as np


def _list_traj_files(directory: str) -> List[str]:
    """Trajectory files in id order, preferring index.json ordering."""
    index_path = os.path.join(directory, "index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            ids = json.load(f)["ids"]
        files = [os.path.join(directory, f"traj_{i:08d}.npz") for i in ids]
        return [p for p in files if os.path.exists(p)]
    return sorted(
        os.path.join(directory, n)
        for n in os.listdir(directory)
        if n.startswith("traj_") and n.endswith(".npz")
    )


def _write_index(directory: str, n: int):
    with open(os.path.join(directory, "index.json"), "w") as f:
        json.dump({"next_id": n, "ids": list(range(n))}, f)


def buffer_info(directory: str) -> Dict:
    """Summary stats for one buffer dir (count, transitions, keys, bytes)."""
    files = _list_traj_files(directory)
    n_transitions = 0
    total_bytes = 0
    keys: Dict[str, str] = {}
    for p in files:
        total_bytes += os.path.getsize(p)
        with np.load(p) as z:
            for k in z.files:
                if k == "__weight__":
                    continue
                arr = z[k]
                keys.setdefault(k, f"{arr.dtype}{list(arr.shape[1:])}")
            first = next((k for k in z.files if k != "__weight__"), None)
            if first is not None:
                n_transitions += z[first].shape[0] if z[first].ndim else 1
    return {
        "dir": directory,
        "trajectories": len(files),
        "transitions": int(n_transitions),
        "bytes": total_bytes,
        "keys": keys,
    }


def merge_buffers(out_dir: str, in_dirs: List[str]) -> int:
    """Concatenate several buffer dirs into one, renumbering ids densely.

    Mirrors the reference's per-rank merge (merge_or_split_replay_buffer.py):
    files are copied (not re-encoded) and a fresh index is written.
    """
    os.makedirs(out_dir, exist_ok=True)
    next_id = 0
    for d in in_dirs:
        for src in _list_traj_files(d):
            dst = os.path.join(out_dir, f"traj_{next_id:08d}.npz")
            shutil.copyfile(src, dst)
            next_id += 1
    _write_index(out_dir, next_id)
    return next_id


def split_buffer(in_dir: str, out_prefix: str, num_splits: int) -> List[str]:
    """Round-robin split one buffer into ``num_splits`` dirs (the reference's
    split mode, used to re-shard a buffer across a different rank count)."""
    files = _list_traj_files(in_dir)
    out_dirs = [f"{out_prefix}{i}" for i in range(num_splits)]
    counts = [0] * num_splits
    for d in out_dirs:
        os.makedirs(d, exist_ok=True)
    for j, src in enumerate(files):
        s = j % num_splits
        dst = os.path.join(out_dirs[s], f"traj_{counts[s]:08d}.npz")
        shutil.copyfile(src, dst)
        counts[s] += 1
    for d, c in zip(out_dirs, counts):
        _write_index(d, c)
    return out_dirs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_info = sub.add_parser("info")
    p_info.add_argument("dirs", nargs="+")
    p_merge = sub.add_parser("merge")
    p_merge.add_argument("--out", required=True)
    p_merge.add_argument("dirs", nargs="+")
    p_split = sub.add_parser("split")
    p_split.add_argument("--out-prefix", required=True)
    p_split.add_argument("--num-splits", type=int, required=True)
    p_split.add_argument("dir")
    args = ap.parse_args(argv)

    if args.cmd == "info":
        for d in args.dirs:
            print(json.dumps(buffer_info(d)))
    elif args.cmd == "merge":
        n = merge_buffers(args.out, args.dirs)
        print(json.dumps({"out": args.out, "trajectories": n}))
    elif args.cmd == "split":
        outs = split_buffer(args.dir, args.out_prefix, args.num_splits)
        print(json.dumps({"outs": outs}))


if __name__ == "__main__":
    main()
