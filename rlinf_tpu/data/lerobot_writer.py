"""LeRobot-v2-format dataset writer/reader (parquet + meta json).

Reference analog: rlinf/data/lerobot_writer.py (LeRobotDatasetWriter
wrapping the lerobot package) + lerobot_paths helpers. Here the on-disk
layout is produced directly with pandas/pyarrow — no lerobot dependency:

  root/
    meta/info.json          (fps, robot_type, features schema, totals)
    meta/tasks.jsonl        ({"task_index": i, "task": text})
    meta/episodes.jsonl     ({"episode_index", "length", "tasks"})
    data/chunk-000/episode_000000.parquet
                            (per-frame rows: observation.state, action,
                             timestamp, frame/episode/task indices, images
                             as flat arrays when present)

This keeps collected robot/sim episodes consumable by lerobot-ecosystem
tooling while ``EpisodeDataset`` (npz) remains the fast in-tree path.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

CHUNK_SIZE = 1000  # episodes per data chunk dir (lerobot default)


class LeRobotDatasetWriter:
    def __init__(self):
        self.root: Optional[str] = None
        self._episodes: List[Dict] = []
        self._tasks: Dict[str, int] = {}
        self._total_frames = 0
        self._features: Dict[str, Dict] = {}
        self._fps = 5
        self._robot_type = "franka_panda"

    def create(
        self,
        root: str,
        *,
        robot_type: str = "franka_panda",
        fps: int = 5,
        features: Optional[Dict[str, Dict[str, Any]]] = None,
    ) -> "LeRobotDatasetWriter":
        self.root = root
        self._robot_type = robot_type
        self._fps = fps
        self._features = features or {}
        os.makedirs(os.path.join(root, "meta"), exist_ok=True)
        os.makedirs(os.path.join(root, "data", "chunk-000"), exist_ok=True)
        return self

    def _task_index(self, task: str) -> int:
        if task not in self._tasks:
            self._tasks[task] = len(self._tasks)
        return self._tasks[task]

    def add_episode(
        self,
        *,
        states: np.ndarray,            # [T, state_dim]
        actions: np.ndarray,           # [T, action_dim]
        task: str = "",
        images: Optional[Dict[str, np.ndarray]] = None,  # key -> [T, H, W, C]
        rewards: Optional[np.ndarray] = None,
        dones: Optional[np.ndarray] = None,
    ) -> int:
        import pandas as pd

        assert self.root, "call create() first"
        T = len(actions)
        ep_idx = len(self._episodes)
        t_idx = self._task_index(task)
        cols: Dict[str, Any] = {
            "observation.state": [np.asarray(s, np.float32) for s in states],
            "action": [np.asarray(a, np.float32) for a in actions],
            "timestamp": np.arange(T, dtype=np.float32) / self._fps,
            "frame_index": np.arange(T, dtype=np.int64),
            "episode_index": np.full(T, ep_idx, np.int64),
            "task_index": np.full(T, t_idx, np.int64),
            "index": np.arange(self._total_frames,
                               self._total_frames + T, dtype=np.int64),
        }
        if rewards is not None:
            cols["next.reward"] = np.asarray(rewards, np.float32)
        if dones is not None:
            cols["next.done"] = np.asarray(dones, bool)
        if images:
            for key, arr in images.items():
                arr = np.asarray(arr)
                # flat per-frame arrays; shape recorded in features meta
                cols[f"observation.images.{key}"] = [
                    f.reshape(-1) for f in arr
                ]
                self._features.setdefault(
                    f"observation.images.{key}",
                    {"dtype": str(arr.dtype), "shape": list(arr.shape[1:])},
                )
        self._features.setdefault(
            "observation.state",
            {"dtype": "float32", "shape": [int(np.asarray(states).shape[-1])]},
        )
        self._features.setdefault(
            "action",
            {"dtype": "float32", "shape": [int(np.asarray(actions).shape[-1])]},
        )
        chunk = ep_idx // CHUNK_SIZE
        chunk_dir = os.path.join(self.root, "data", f"chunk-{chunk:03d}")
        os.makedirs(chunk_dir, exist_ok=True)
        pd.DataFrame(cols).to_parquet(
            os.path.join(chunk_dir, f"episode_{ep_idx:06d}.parquet")
        )
        self._episodes.append(
            {"episode_index": ep_idx, "length": T, "tasks": [task]}
        )
        self._total_frames += T
        return ep_idx

    def finalize(self) -> str:
        assert self.root
        meta = os.path.join(self.root, "meta")
        info = {
            "codebase_version": "v2.1",
            "robot_type": self._robot_type,
            "fps": self._fps,
            "total_episodes": len(self._episodes),
            "total_frames": self._total_frames,
            "total_tasks": len(self._tasks),
            "chunks_size": CHUNK_SIZE,
            "data_path": (
                "data/chunk-{episode_chunk:03d}/episode_{episode_index:06d}.parquet"
            ),
            "features": self._features,
        }
        with open(os.path.join(meta, "info.json"), "w") as f:
            json.dump(info, f, indent=2)
        with open(os.path.join(meta, "episodes.jsonl"), "w") as f:
            for ep in self._episodes:
                f.write(json.dumps(ep) + "\n")
        with open(os.path.join(meta, "tasks.jsonl"), "w") as f:
            for task, idx in sorted(self._tasks.items(), key=lambda kv: kv[1]):
                f.write(json.dumps({"task_index": idx, "task": task}) + "\n")
        return self.root


def read_lerobot_episode(root: str, episode_index: int) -> Dict[str, np.ndarray]:
    """Load one episode back as arrays (images restored to [T, H, W, C])."""
    import pandas as pd

    with open(os.path.join(root, "meta", "info.json")) as f:
        info = json.load(f)
    chunk = episode_index // info.get("chunks_size", CHUNK_SIZE)
    df = pd.read_parquet(os.path.join(
        root, "data", f"chunk-{chunk:03d}",
        f"episode_{episode_index:06d}.parquet",
    ))
    out: Dict[str, np.ndarray] = {}
    for col in df.columns:
        vals = df[col].to_numpy()
        if vals.dtype == object:
            arr = np.stack([np.asarray(v) for v in vals])
            feat = info["features"].get(col)
            if feat and col.startswith("observation.images."):
                arr = arr.reshape((len(arr), *feat["shape"]))
            out[col] = arr
        else:
            out[col] = vals
    return out
