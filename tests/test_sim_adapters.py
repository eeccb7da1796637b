"""Named sim adapters exercised against FAKE sim modules (VERDICT r3 #7).

The mapping logic (torch->numpy, obs-key conventions, dense-reward shaping,
success_once latching, partial auto-reset, image flips) runs for real here;
only the simulators themselves are faked (tests/fake_sims.py).

Reference analogs: rlinf/envs/maniskill/maniskill_env.py:45,
rlinf/envs/metaworld/metaworld_env.py, rlinf/envs/libero/libero_env.py.
"""

import numpy as np
import pytest

from fake_sims import (
    install_fake_libero,
    install_fake_mani_skill,
    install_fake_metaworld,
)


# ---------------------------------------------------------------------------
# ManiSkill
# ---------------------------------------------------------------------------


def _make_maniskill(monkeypatch, **kw):
    from rlinf_tpu.envs.adapters import ManiSkillEnv

    env_id = install_fake_mani_skill(monkeypatch)
    return ManiSkillEnv(4, seed=0, env_id=env_id, **kw)


def test_maniskill_state_obs_and_dense_reward(monkeypatch):
    env = _make_maniskill(monkeypatch, obs_mode="state")
    obs = env.reset()
    assert obs["states"].shape == (4, 5)
    assert obs["states"].dtype == np.float32

    a = np.zeros((4, 7), np.float32)
    # t=1: grasped only -> dense reward 0.1
    out = env.step(a)
    np.testing.assert_allclose(out.reward, 0.1, atol=1e-6)
    assert not out.info["success"].any()
    # t=2: grasped + consecutive -> 0.2
    out = env.step(a)
    np.testing.assert_allclose(out.reward, 0.2, atol=1e-6)
    # t=3: success & grasped -> 1.2, terminated, auto partial reset
    out = env.step(a)
    np.testing.assert_allclose(out.reward, 1.2, atol=1e-6)
    assert out.done.all() and out.terminated.all()
    assert out.info["success"].all()
    # partial reset went through options={"env_idx": ...}
    ms = env._env.unwrapped
    assert any("env_idx" in c for c in ms.reset_calls)
    # obs after auto-reset is the fresh (t=0) state
    np.testing.assert_allclose(obs["states"], env._wrap_obs(ms._obs())["states"])

    m = env.metrics()
    assert m["env/success_once"] == 1.0
    assert m["env/success_at_end"] == 1.0
    assert m["env/num_episodes"] == 4.0
    np.testing.assert_allclose(m["env/episode_return"], 1.5, atol=1e-6)


def test_maniskill_rgb_obs_mapping(monkeypatch):
    env = _make_maniskill(monkeypatch, obs_mode="rgb")
    obs = env.reset()
    assert obs["main_images"].shape == (4, 8, 8, 3)
    assert obs["main_images"].dtype == np.uint8
    assert obs["states"].shape == (4, 9)  # qpos proprio


def test_maniskill_reward_modes_and_rel(monkeypatch):
    env = _make_maniskill(monkeypatch, reward_mode="only_success")
    env.reset()
    a = np.zeros((4, 7), np.float32)
    assert env.step(a).reward.sum() == 0.0          # no success yet
    env2 = _make_maniskill(monkeypatch, reward_mode="raw",
                           use_rel_reward=True)
    env2.reset()
    out = env2.step(a)
    np.testing.assert_allclose(out.reward, 1.0)     # 1 - 0 (prev)
    out = env2.step(a)
    np.testing.assert_allclose(out.reward, 0.0)     # 1 - 1 diff


def test_maniskill_ignore_terminations(monkeypatch):
    env = _make_maniskill(monkeypatch, ignore_terminations=True,
                          obs_mode="state")
    env.reset()
    a = np.zeros((4, 7), np.float32)
    for _ in range(5):
        out = env.step(a)
        assert not out.terminated.any()
    # episode ends only at the horizon truncation (t=6)
    out = env.step(a)
    assert out.done.all()
    m = env.metrics()
    assert m["env/success_once"] == 1.0   # success happened mid-episode
    assert m["env/success_at_end"] == 1.0


# ---------------------------------------------------------------------------
# Metaworld
# ---------------------------------------------------------------------------


def test_metaworld_mapping(monkeypatch):
    install_fake_metaworld(monkeypatch)
    from rlinf_tpu.envs.adapters import MetaWorldEnv

    env = MetaWorldEnv(3, seed=0, env_name="reach-v2", image_obs=True,
                       max_episode_steps=4)
    obs = env.reset()
    assert obs["states"].shape == (3, 39)
    assert obs["main_images"].shape == (3, 8, 8, 3)
    # render marker was at [0,0]; the reference flip [::-1, ::-1] moves it
    # to the opposite corner
    assert obs["main_images"][0, -1, -1, 0] == 255
    assert obs["main_images"][0, 0, 0, 0] == 0

    a = np.zeros((3, 4), np.float32)
    out = env.step(a)
    assert not out.info["success"].any()   # success at t>=2
    out = env.step(a)
    assert out.info["success"].all()
    # fixed-horizon episode end at t=4 latches success_once
    env.step(a)
    out = env.step(a)
    assert out.done.all()
    m = env.metrics()
    assert m["env/success_once"] == 1.0
    assert m["env/num_episodes"] == 3.0
    np.testing.assert_allclose(m["env/episode_return"], 2.0)  # 4 * 0.5


# ---------------------------------------------------------------------------
# LIBERO
# ---------------------------------------------------------------------------


def test_libero_mapping(monkeypatch, tmp_path):
    install_fake_libero(monkeypatch, tmp_path)
    from rlinf_tpu.envs.adapters import LiberoEnv

    env = LiberoEnv(2, seed=0, task_suite_name="libero_spatial", task_id=0,
                    camera_heights=16, camera_widths=16,
                    max_episode_steps=10)
    assert env.task_description == "put the bowl on the plate"
    obs = env.reset()
    assert obs["main_images"].shape == (2, 16, 16, 3)
    assert obs["wrist_images"].shape == (2, 16, 16, 3)
    assert obs["states"].shape == (2, 9)  # 3 pos + 4 quat + 2 gripper
    # agentview marker was the TOP row; [::-1] flip puts it at the bottom
    assert obs["main_images"][0, -1, 0, 0] == 255
    assert obs["main_images"][0, 0, 0, 0] == 0
    # fixed init states were applied
    assert env._envs[0].init_state_set is not None

    a = np.zeros((2, 7), np.float32)
    for _ in range(3):
        out = env.step(a)
        assert not out.done.any()
        assert (out.reward == 0).all()
    out = env.step(a)       # t=4: check_success() True -> sparse reward 1
    assert out.done.all()
    np.testing.assert_allclose(out.reward, 1.0)
    m = env.metrics()
    assert m["env/success_once"] == 1.0
    assert m["env/num_episodes"] == 2.0


def test_adapters_importable_without_sims():
    """The module must import with no sim installed; construction raises an
    actionable ImportError (reference utils/patcher.py stub-import pattern)."""
    from rlinf_tpu.envs.adapters import LiberoEnv, ManiSkillEnv, MetaWorldEnv

    for cls in (ManiSkillEnv, MetaWorldEnv, LiberoEnv):
        with pytest.raises(ImportError):
            cls(2, seed=0)


def test_registry_names():
    from rlinf_tpu.envs import get_env_cls

    for name in ("gym", "maniskill", "metaworld", "libero"):
        assert get_env_cls(name) is not None
