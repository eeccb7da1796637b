"""Env adapters, video recording, VQA/episode datasets.

Reference analog: the simulator adapter layer (rlinf/envs/) + wrappers
(record_video.py, collect_episode.py) + VQA/lerobot datasets (rlinf/data/).
Gymnasium stands in for the heavy sims the way the reference's unit tests use
single-node toy workers.
"""

import json
import os

import numpy as np
import pytest

from rlinf_tpu.data.datasets import EpisodeDataset, VQADataset
from rlinf_tpu.envs import get_env_cls
from rlinf_tpu.envs.adapters import GymVectorEnv
from rlinf_tpu.envs.toy import PointReachEnv
from rlinf_tpu.envs.wrappers import CollectEpisodeWrapper, RecordVideoWrapper


def test_gym_adapter_continuous():
    env = GymVectorEnv(4, seed=0, env_id="Pendulum-v1")
    assert env.action_dim == 1
    assert env.obs_spec == {"states": (3,)}
    obs = env.reset()
    assert obs["states"].shape == (4, 3)
    rng = np.random.default_rng(0)
    for _ in range(250):   # past Pendulum's 200-step truncation
        out = env.step(rng.uniform(-2, 2, (4, 1)).astype(np.float32))
    m = env.metrics()
    assert m["env/num_episodes"] >= 4.0
    assert "env/episode_return" in m
    env.offload()


def test_gym_adapter_discrete():
    env = GymVectorEnv(3, seed=0, env_id="CartPole-v1")
    assert env.action_dim == 2 and env._discrete
    env.reset()
    logits = np.zeros((3, 2), np.float32)
    logits[:, 1] = 1.0
    out = env.step(logits)          # one-hot/logits route
    assert out.reward.shape == (3,)
    out = env.step(np.array([0, 1, 0]))   # index route
    assert out.obs["states"].shape == (3, 4)
    env.offload()


def test_registry_has_adapters():
    assert get_env_cls("gym") is GymVectorEnv
    for name in ("maniskill", "metaworld", "libero"):
        cls = get_env_cls(name)
        with pytest.raises((ImportError, NotImplementedError)):
            cls(2)


def test_record_video_wrapper(tmp_path):
    class ImgEnv(PointReachEnv):
        def _obs(self):
            base = super()._obs()
            base["images"] = np.tile(
                np.abs(base["states"][:, :1, None, None]),
                (1, 16, 16, 3)).astype(np.float32).clip(0, 1)
            return base

    env = ImgEnv(num_envs=2, seed=0, max_episode_steps=5)
    env.obs_spec = {"states": (4,), "images": (16, 16, 3)}
    rec = RecordVideoWrapper(env, str(tmp_path), record_every=1, fps=5)
    obs = rec.reset()
    rng = np.random.default_rng(0)
    for _ in range(12):   # >2 episodes of env 0
        rec.step(rng.uniform(-1, 1, (2, 2)).astype(np.float32))
    assert rec.videos_written >= 2
    vids = [f for f in os.listdir(tmp_path)
            if f.endswith((".mp4", ".gif"))]
    assert len(vids) == rec.videos_written
    assert os.path.getsize(os.path.join(tmp_path, vids[0])) > 0
    assert rec.metrics()["video/videos_written"] >= 2.0


def test_vqa_dataset(tmp_path):
    rows = [
        {"image": [[[0.1] * 3] * 4] * 4, "question": "color?",
         "answers": ["red", "crimson"]},
        {"image_path": "missing.png", "question": "what?", "answer": "cat"},
    ]
    p = tmp_path / "vqa.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = VQADataset.from_jsonl(str(p))
    assert len(ds) == 2
    assert ds[0].answers == ["red", "crimson"]
    assert ds[1].answers == ["cat"]
    img = VQADataset.load_image(ds[0])
    assert img.shape == (4, 4, 3)


def test_episode_dataset(tmp_path):
    env = PointReachEnv(num_envs=3, seed=0, max_episode_steps=4)
    wrapped = CollectEpisodeWrapper(env, str(tmp_path))
    wrapped.reset()
    rng = np.random.default_rng(0)
    for _ in range(16):
        wrapped.step(rng.uniform(-1, 1, (3, 2)).astype(np.float32))
    assert wrapped._episodes_written >= 3

    ds = EpisodeDataset(str(tmp_path))
    assert ds.num_episodes == wrapped._episodes_written
    assert ds.num_frames == sum(ds.episode_lengths)
    batch = ds.sample_frames(8, np.random.default_rng(1))
    assert batch["actions"].shape == (8, 2)
    assert batch["obs/states"].shape == (8, 4)
    assert batch["rewards"].shape == (8,)
