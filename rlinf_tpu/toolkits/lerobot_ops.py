"""LeRobot dataset maintenance ops: merge, verify, rot6d backfill.

Reference analog: toolkits/dual_franka/ (merge_lerobot.py — the 7-step
multi-source merge: precheck, episode renumbering, index rewrite, stats
update, info/tasks union, jsonl merge, parquet moves, verify;
backfill_tcp_rot6d.py — appending a 6D-rotation TCP representation to
recorded states). Operates on the in-tree LeRobot-v2 layout
(data/lerobot_writer.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from rlinf_tpu.data.lerobot_writer import CHUNK_SIZE


def _read_meta(root: str):
    with open(os.path.join(root, "meta", "info.json")) as f:
        info = json.load(f)
    episodes = []
    with open(os.path.join(root, "meta", "episodes.jsonl")) as f:
        for ln in f:
            if ln.strip():
                episodes.append(json.loads(ln))
    tasks = []
    tp = os.path.join(root, "meta", "tasks.jsonl")
    if os.path.exists(tp):
        with open(tp) as f:
            for ln in f:
                if ln.strip():
                    tasks.append(json.loads(ln))
    return info, episodes, tasks


def _episode_path(root: str, idx: int) -> str:
    return os.path.join(
        root, "data", f"chunk-{idx // CHUNK_SIZE:03d}",
        f"episode_{idx:06d}.parquet")


def verify_lerobot(root: str) -> Dict[str, int]:
    """Consistency check (reference merge_lerobot.py step7_verify): every
    episode file exists, per-file frame counts match episodes.jsonl, frame
    and episode indices are contiguous, info totals agree. Returns counts;
    raises ValueError with every problem found."""
    import pandas as pd

    info, episodes, tasks = _read_meta(root)
    problems: List[str] = []
    total_frames = 0
    task_ids = {t["task_index"] for t in tasks}
    for want, ep in enumerate(episodes):
        idx = ep["episode_index"]
        if idx != want:
            problems.append(f"episode_index {idx} != position {want}")
        path = _episode_path(root, idx)
        if not os.path.exists(path):
            problems.append(f"missing {path}")
            continue
        df = pd.read_parquet(path)
        if len(df) != ep["length"]:
            problems.append(
                f"ep {idx}: {len(df)} frames vs meta length {ep['length']}")
        if not (df["episode_index"] == idx).all():
            problems.append(f"ep {idx}: stale episode_index column")
        fi = df["frame_index"].to_numpy()
        if not np.array_equal(fi, np.arange(len(df))):
            problems.append(f"ep {idx}: frame_index not contiguous")
        if "task_index" in df and task_ids:
            bad = set(df["task_index"].tolist()) - task_ids
            if bad:
                problems.append(f"ep {idx}: unknown task ids {sorted(bad)}")
        total_frames += len(df)
    if info.get("total_episodes") != len(episodes):
        problems.append(
            f"info.total_episodes {info.get('total_episodes')} != "
            f"{len(episodes)}")
    if info.get("total_frames") != total_frames:
        problems.append(
            f"info.total_frames {info.get('total_frames')} != {total_frames}")
    if problems:
        raise ValueError("; ".join(problems))
    return {"episodes": len(episodes), "frames": total_frames,
            "tasks": len(tasks)}


def merge_lerobot(sources: List[str], out_root: str) -> Dict[str, int]:
    """Merge N LeRobot datasets into one (reference merge_lerobot.py steps
    0-7 collapsed): schema precheck, global episode renumbering, in-file
    episode/task index rewrite, task-table union, jsonl merge, chunked
    parquet layout, final verify."""
    import pandas as pd

    assert sources, "no source datasets"
    # step 0: precheck — schemas must agree
    infos = []
    for s in sources:
        verify_lerobot(s)
        infos.append(_read_meta(s))
    feat0 = infos[0][0].get("features", {})
    for s, (info, _, _) in zip(sources[1:], infos[1:]):
        if info.get("features", {}) != feat0:
            raise ValueError(f"feature schema mismatch: {sources[0]} vs {s}")

    os.makedirs(os.path.join(out_root, "meta"), exist_ok=True)
    # task union (stable order of first appearance)
    task_map: Dict[str, int] = {}
    for _, _, tasks in infos:
        for t in tasks:
            task_map.setdefault(t["task"], len(task_map))

    new_episodes = []
    total_frames = 0
    out_idx = 0
    for src, (info, episodes, tasks) in zip(sources, infos):
        src_task_text = {t["task_index"]: t["task"] for t in tasks}
        for ep in episodes:
            df = pd.read_parquet(_episode_path(src, ep["episode_index"]))
            df["episode_index"] = out_idx
            ep_tasks = ep.get("tasks", [])
            if "task_index" in df and src_task_text:
                orig_ids = sorted({int(x) for x in df["task_index"]})
                df["task_index"] = [
                    task_map[src_task_text[int(i)]]
                    for i in df["task_index"]
                ]
                ep_tasks = [task_map[src_task_text[i]] for i in orig_ids]
            dst = _episode_path(out_root, out_idx)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            df.to_parquet(dst)
            new_episodes.append({
                "episode_index": out_idx, "length": int(len(df)),
                "tasks": ep_tasks,
            })
            total_frames += len(df)
            out_idx += 1

    with open(os.path.join(out_root, "meta", "tasks.jsonl"), "w") as f:
        for task, i in sorted(task_map.items(), key=lambda kv: kv[1]):
            f.write(json.dumps({"task_index": i, "task": task}) + "\n")
    with open(os.path.join(out_root, "meta", "episodes.jsonl"), "w") as f:
        for ep in new_episodes:
            f.write(json.dumps(ep) + "\n")
    out_info = dict(infos[0][0])
    out_info["total_episodes"] = out_idx
    out_info["total_frames"] = total_frames
    out_info["total_tasks"] = len(task_map)
    with open(os.path.join(out_root, "meta", "info.json"), "w") as f:
        json.dump(out_info, f, indent=1)
    return verify_lerobot(out_root)


def quat_to_rot6d(quat_xyzw: np.ndarray) -> np.ndarray:
    """[..., 4] xyzw quaternions -> [..., 6] rot6d (first two rotation
    matrix columns, the continuous orientation representation the
    reference backfills — backfill_tcp_rot6d.py)."""
    q = np.asarray(quat_xyzw, np.float64)
    n = np.linalg.norm(q, axis=-1, keepdims=True)
    if not np.allclose(n, 1.0, atol=1e-3):
        raise ValueError("quaternions must be unit-norm")
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # rotation matrix columns 0 and 1
    c0 = np.stack([1 - 2 * (y * y + z * z),
                   2 * (x * y + z * w),
                   2 * (x * z - y * w)], axis=-1)
    c1 = np.stack([2 * (x * y - z * w),
                   1 - 2 * (x * x + z * z),
                   2 * (y * z + x * w)], axis=-1)
    return np.concatenate([c0, c1], axis=-1).astype(np.float32)


def backfill_rot6d(
    root: str, *, state_key: str = "observation.state",
    quat_slice: slice = slice(3, 7),
    out_key: Optional[str] = None,
) -> int:
    """Append a rot6d column derived from the quaternion slice of each
    frame's state vector (reference backfill_tcp_rot6d.py semantics:
    validate unit quats, convert, write back in place). Returns frames
    updated."""
    import pandas as pd

    out_key = out_key or f"{state_key}.rot6d"
    _, episodes, _ = _read_meta(root)
    n = 0
    for ep in episodes:
        path = _episode_path(root, ep["episode_index"])
        df = pd.read_parquet(path)
        states = np.stack([np.asarray(s) for s in df[state_key]])
        r6 = quat_to_rot6d(states[:, quat_slice])
        df[out_key] = [row for row in r6]
        df.to_parquet(path)
        n += len(df)
    return n
