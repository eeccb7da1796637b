"""Toolkit CLIs: replay-buffer ops, trajectory viz, realworld preflight,
standalone eval (reference toolkits/ + evaluations/)."""

import json

import numpy as np

from rlinf_tpu.data.replay_buffer import ReplayBuffer
from rlinf_tpu.toolkits.realworld_check import preflight
from rlinf_tpu.toolkits.replay_buffer_ops import (
    buffer_info,
    merge_buffers,
    split_buffer,
)
from rlinf_tpu.toolkits.visualize_trajectories import (
    render_trajectory,
    summarize_trajectory,
)
from rlinf_tpu.envs.realworld import RobotConfig


def _make_buffer(directory, n, t=5, seed=0):
    rng = np.random.default_rng(seed)
    buf = ReplayBuffer(capacity=100, directory=str(directory), seed=seed)
    for _ in range(n):
        buf.add(
            {
                "obs": rng.normal(size=(t, 3)).astype(np.float32),
                "rewards": rng.normal(size=(t,)).astype(np.float32),
            }
        )
    buf.flush()
    return buf


def test_buffer_info_merge_split(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    _make_buffer(a, 3, seed=0)
    _make_buffer(b, 5, seed=1)

    info = buffer_info(str(a))
    assert info["trajectories"] == 3
    assert info["transitions"] == 15
    assert "obs" in info["keys"]

    out = tmp_path / "merged"
    n = merge_buffers(str(out), [str(a), str(b)])
    assert n == 8
    assert buffer_info(str(out))["trajectories"] == 8
    # merged buffer must be restorable through the normal ReplayBuffer path
    restored = ReplayBuffer.restore(str(out))
    assert len(restored) == 8

    outs = split_buffer(str(out), str(tmp_path / "shard"), 3)
    counts = [buffer_info(d)["trajectories"] for d in outs]
    assert sum(counts) == 8 and max(counts) - min(counts) <= 1
    for d in outs:
        ReplayBuffer.restore(d)


def test_visualize_summary_and_render(tmp_path):
    data = {
        "images": np.zeros((12, 8, 8, 3), np.uint8),
        "rewards": np.linspace(0, 1, 12).astype(np.float32),
        "dones": np.zeros(12, np.float32),
    }
    s = summarize_trajectory(data)
    assert s["return"] > 0 and s["images"]["shape"] == [12, 8, 8, 3]
    png = render_trajectory(data, str(tmp_path / "t.png"), stride=2)
    if png is not None:  # matplotlib present
        import os

        assert os.path.getsize(png) > 0


def test_realworld_preflight_simulated():
    results = preflight(RobotConfig(robot_type="simulated", control_hz=50.0),
                        n_rate_steps=5)
    by_name = {r.name: r for r in results}
    assert all(r.ok for r in results), [r.as_dict() for r in results if not r.ok]
    assert "control_rate" in by_name and "zero_action_roundtrip" in by_name


def test_realworld_preflight_reports_failure():
    results = preflight(RobotConfig(robot_type="no_such_robot"))
    assert len(results) == 1 and not results[0].ok


def test_standalone_eval_embodied(capsys):
    from rlinf_tpu.toolkits.standalone_eval import main

    main(["embodied", "--env", "point_reach", "--num-envs", "4",
          "--steps", "40"])  # > max_episode_steps so episodes complete
    out = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(out[-1])
    assert any(k.startswith("eval/") for k in payload)
