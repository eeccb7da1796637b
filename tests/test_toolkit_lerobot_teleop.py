"""LeRobot dataset ops (merge/verify/rot6d) + teleop collection pipeline.

Reference analogs: toolkits/dual_franka/merge_lerobot.py (7-step merge),
backfill_tcp_rot6d.py, and the GELLO/SpaceMouse/PICO collection loops
behind toolkits/realworld_check/collect_monitor.py.
"""

import json
import os

import numpy as np
import pytest

pytest.importorskip("pandas")

from rlinf_tpu.data.lerobot_writer import LeRobotDatasetWriter
from rlinf_tpu.toolkits.lerobot_ops import (
    backfill_rot6d,
    merge_lerobot,
    quat_to_rot6d,
    verify_lerobot,
)
from rlinf_tpu.toolkits.teleop import (
    CollectorConfig,
    RetargetConfig,
    TeleopCollector,
    TeleopFrame,
    retarget,
)


def _make_ds(root, n_eps, task, seed=0, state_dim=8):
    r = np.random.default_rng(seed)
    w = LeRobotDatasetWriter()
    w.create(str(root), fps=10)
    for e in range(n_eps):
        T = int(r.integers(3, 7))
        quat = r.normal(size=(T, 4))
        quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
        states = np.concatenate(
            [r.random((T, 3)), quat, r.random((T, state_dim - 7))], axis=1
        ).astype(np.float32)
        w.add_episode(states=states, actions=r.random((T, 4)).astype(np.float32),
                      task=task)
    w.finalize()
    return str(root)


def test_verify_and_merge(tmp_path):
    a = _make_ds(tmp_path / "a", 3, "pick", seed=1)
    b = _make_ds(tmp_path / "b", 2, "place", seed=2)
    assert verify_lerobot(a)["episodes"] == 3

    out = str(tmp_path / "merged")
    res = merge_lerobot([a, b], out)
    assert res["episodes"] == 5
    # task union preserved with re-indexed ids
    tasks = [json.loads(l) for l in open(os.path.join(out, "meta", "tasks.jsonl"))]
    assert {t["task"] for t in tasks} == {"pick", "place"}
    # episode files renumbered contiguously
    eps = [json.loads(l) for l in open(os.path.join(out, "meta", "episodes.jsonl"))]
    assert [e["episode_index"] for e in eps] == list(range(5))


def test_verify_catches_corruption(tmp_path):
    a = _make_ds(tmp_path / "a", 2, "pick")
    os.remove(os.path.join(a, "data", "chunk-000", "episode_000001.parquet"))
    with pytest.raises(ValueError, match="missing"):
        verify_lerobot(a)


def test_quat_to_rot6d_identity_and_backfill(tmp_path):
    # identity quaternion -> identity matrix columns
    r6 = quat_to_rot6d(np.array([[0.0, 0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(r6, [[1, 0, 0, 0, 1, 0]], atol=1e-6)
    # 90 deg about z (xyzw)
    s = np.sin(np.pi / 4)
    r6 = quat_to_rot6d(np.array([[0.0, 0.0, s, np.cos(np.pi / 4)]]))
    np.testing.assert_allclose(r6, [[0, 1, 0, -1, 0, 0]], atol=1e-6)
    with pytest.raises(ValueError):
        quat_to_rot6d(np.array([[0.0, 0.0, 0.0, 2.0]]))

    a = _make_ds(tmp_path / "a", 2, "pick")
    n = backfill_rot6d(a, quat_slice=slice(3, 7))
    assert n > 0
    import pandas as pd

    df = pd.read_parquet(os.path.join(
        a, "data", "chunk-000", "episode_000000.parquet"))
    assert "observation.state.rot6d" in df
    assert len(np.asarray(df["observation.state.rot6d"][0])) == 6


# ---------------------------------------------------------------------------
# teleop
# ---------------------------------------------------------------------------


def test_retarget_deadband_scale_flip_clip():
    cfg = RetargetConfig(scale=2.0, deadband=0.1, clip=0.5, flip=[1])
    fr = TeleopFrame(delta=np.array([0.05, 0.2, -0.4]), gripper=1.0)
    act = retarget(fr, cfg, action_dim=4)
    np.testing.assert_allclose(act, [0.0, -0.4, -0.5, 1.0], atol=1e-6)


def test_retarget_axis_map():
    cfg = RetargetConfig(axis_map=[2, 0, 1], clip=10.0)
    fr = TeleopFrame(delta=np.array([1.0, 2.0, 3.0]))
    act = retarget(fr, cfg, action_dim=4)
    np.testing.assert_allclose(act[:3], [2.0, 3.0, 1.0])


class ScriptedDevice:
    """start -> N motion frames -> success."""

    def __init__(self, n_frames):
        self.script = (
            [TeleopFrame(np.zeros(3), buttons={"start": True})]
            + [TeleopFrame(np.array([0.1, 0.0, 0.0]), gripper=0.5)
               for _ in range(n_frames)]
            + [TeleopFrame(np.zeros(3), buttons={"success": True})] * 3
        )
        self.i = 0

    def read(self):
        fr = self.script[min(self.i, len(self.script) - 1)]
        self.i += 1
        return fr


class FakeTeleopEnv:
    def __init__(self):
        self.t = 0

    def reset(self):
        self.t = 0
        return {"states": np.zeros(8, np.float32)}

    def step(self, action):
        self.t += 1
        return ({"states": np.full(8, self.t, np.float32)}, 0.0, False, {})


def test_teleop_collector_writes_episode(tmp_path):
    writer = LeRobotDatasetWriter()
    writer.create(str(tmp_path / "ds"), fps=10)
    dev = ScriptedDevice(n_frames=5)
    t = {"now": 0.0}
    col = TeleopCollector(
        dev, FakeTeleopEnv(), writer,
        CollectorConfig(hz=10, action_dim=4, task="wipe"),
        clock=lambda: t["now"],
        sleep=lambda s: t.__setitem__("now", t["now"] + s),
    )
    out = col.collect_episode()
    assert out["success"] and out["frames"] == 5
    writer.finalize()
    res = verify_lerobot(str(tmp_path / "ds"))
    assert res["frames"] == 5
    # fixed-rate pacing advanced the clock ~5 periods
    assert t["now"] >= 0.4
