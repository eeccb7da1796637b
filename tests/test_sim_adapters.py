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


# ---------------------------------------------------------------------------
# IsaacLab (tier 2, VERDICT r4 item 8)
# ---------------------------------------------------------------------------


def _make_isaaclab(**kw):
    from fake_sims import FakeIsaacLabEnv

    from rlinf_tpu.envs.adapters import IsaacLabEnv

    fake = FakeIsaacLabEnv(num_envs=4)
    env = IsaacLabEnv(4, seed=0, env_factory=lambda: fake,
                      max_episode_steps=10, **kw)
    return env, fake


def test_isaaclab_obs_mapping_and_sparse_reward():
    env, fake = _make_isaaclab()
    obs = env.reset()
    assert obs["main_images"].shape == (4, 8, 8, 3)
    assert obs["wrist_images"].shape == (4, 8, 8, 3)
    # states = [eef_pos(3) | axis-angle(3) | gripper(2)]; identity quat ->
    # zero axis-angle
    assert obs["states"].shape == (4, 8)
    np.testing.assert_allclose(obs["states"][:, 3:6], 0.0, atol=1e-6)
    assert obs["task_descriptions"] == ["stack the cubes"] * 4

    a = np.zeros((4, 7), np.float32)
    out = env.step(a)
    np.testing.assert_allclose(out.reward, 0.0)
    out = env.step(a)
    out = env.step(a)  # success step
    np.testing.assert_allclose(out.reward, 1.0)
    assert out.done.all() and out.terminated.all()
    # partial reset hit env_ids
    assert any(c["env_ids"] is not None for c in fake.reset_calls)
    m = env.metrics()
    assert m["env/success_once"] == 1.0


def test_isaaclab_rel_reward_and_ignore_terminations():
    env, fake = _make_isaaclab(use_rel_reward=True, ignore_terminations=True,
                               reward_coef=2.0)
    env.reset()
    a = np.zeros((4, 7), np.float32)
    env.step(a)
    env.step(a)
    out = env.step(a)  # success: rel diff = 2.0 - 0.0
    np.testing.assert_allclose(out.reward, 2.0)
    assert not out.terminated.any()       # zeroed by ignore_terminations
    assert out.info["success"].all()      # recorded as success_at_end
    assert not out.done.any()             # no truncation yet either


def test_isaaclab_quat_to_axisangle():
    from rlinf_tpu.envs.adapters import _quat_wxyz_to_axisangle

    # 90 deg about z: wxyz = [cos45, 0, 0, sin45] -> axis-angle [0,0,pi/2]
    q = np.array([[np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]])
    aa = _quat_wxyz_to_axisangle(q)
    np.testing.assert_allclose(aa, [[0, 0, np.pi / 2]], atol=1e-5)


# ---------------------------------------------------------------------------
# RoboTwin (tier 2)
# ---------------------------------------------------------------------------


def _make_robotwin(**kw):
    from fake_sims import FakeRoboTwinVectorEnv

    from rlinf_tpu.envs.adapters import RoboTwinEnv

    holder = {}

    def factory():
        holder["env"] = FakeRoboTwinVectorEnv(
            n_envs=4, env_seeds=[0, 1, 2, 3])
        return holder["env"]

    env = RoboTwinEnv(4, seed=0, env_factory=factory,
                      max_episode_steps=10, **kw)
    return env, holder


def test_robotwin_obs_mapping_and_seed_addressed_reset():
    env, holder = _make_robotwin(success_seeds=list(range(0, 64, 2)))
    obs = env.reset()
    fake = holder["env"]
    assert obs["main_images"].shape == (4, 8, 8, 3)
    assert obs["wrist_images"].shape == (4, 2, 8, 8, 3)  # left+right stacked
    assert obs["states"].shape == (4, 14)
    # reset was seed-addressed from the curated pool (all even)
    seeds = fake.reset_calls[-1]["env_seeds"]
    assert seeds is not None and all(s % 2 == 0 for s in seeds)

    a = np.zeros((4, 14), np.float32)
    env.step(a)
    out = env.step(a)  # success at t=2 for even seeds
    np.testing.assert_allclose(out.reward, 1.0)
    assert out.done.all()
    # auto-reset re-seeded the done rows
    assert fake.reset_calls[-1]["env_idx"] is not None
    m = env.metrics()
    assert m["env/success_once"] == 1.0


def test_robotwin_partition_success_seeds():
    from rlinf_tpu.envs.adapters import partition_success_seeds

    seeds = np.arange(100)
    a = partition_success_seeds(seeds, base_seed=7, seed_offset=0,
                                total_num_processes=4, num_group=4)
    b = partition_success_seeds(seeds, base_seed=7, seed_offset=1,
                                total_num_processes=4, num_group=4)
    assert len(a) == 24 and len(b) == 24  # 25 per worker, trimmed to 24
    assert not set(a.tolist()) & set(b.tolist())  # non-overlapping
    # deterministic under the same base seed
    a2 = partition_success_seeds(seeds, base_seed=7, seed_offset=0,
                                 total_num_processes=4, num_group=4)
    np.testing.assert_array_equal(a, a2)


def test_robotwin_horizon_actions():
    from fake_sims import FakeRoboTwinVectorEnv

    from rlinf_tpu.envs.adapters import RoboTwinEnv

    fake = FakeRoboTwinVectorEnv(n_envs=4, success_at=100)  # never succeeds
    env = RoboTwinEnv(4, seed=0, env_factory=lambda: fake,
                      max_episode_steps=10)
    env.reset()
    # action chunks [N, horizon, A] advance elapsed_steps by horizon
    a = np.zeros((4, 3, 14), np.float32)
    env.step(a)
    np.testing.assert_array_equal(env._elapsed, 3)


# ---------------------------------------------------------------------------
# CALVIN (tier 2)
# ---------------------------------------------------------------------------


def _make_calvin(**kw):
    from fake_sims import FakeCalvinBenchmark, FakeCalvinVectorEnv

    from rlinf_tpu.envs.adapters import CalvinEnv

    fake = FakeCalvinVectorEnv(num_envs=4)
    env = CalvinEnv(4, seed=0, env_factory=lambda: fake,
                    benchmark=FakeCalvinBenchmark(),
                    max_episode_steps=20, **kw)
    fake.adapter = env
    return env, fake


def test_calvin_chain_progression_and_rewards():
    env, fake = _make_calvin()
    obs = env.reset()
    assert obs["main_images"].shape == (4, 8, 8, 3)
    assert obs["states"].shape == (4, 15)
    # announced description matches subtask 0 of each chain
    for i in range(4):
        want = f"please {env._task_seq[i][0].replace('_', ' ')}"
        assert obs["task_descriptions"][i] == want

    a = np.zeros((4, 7), np.float32)
    # each step completes the current subtask -> reward 1, idx advances,
    # description switches to the NEXT subtask
    for step in range(4):
        out = env.step(a)
        np.testing.assert_allclose(out.reward, 1.0)
        assert not out.done.any()
        for i in range(4):
            want = f"please {env._task_seq[i][step + 1].replace('_', ' ')}"
            assert out.obs["task_descriptions"][i] == want
    out = env.step(a)  # 5th subtask -> full chain complete
    np.testing.assert_allclose(out.reward, 1.0)
    assert out.done.all() and out.info["success"].all()
    m = env.metrics()
    assert m["env/success_once"] == 1.0
    assert m["env/avg_chain_length"] == 5.0


def test_calvin_worker_partition_disjoint():
    from fake_sims import FakeCalvinBenchmark, FakeCalvinVectorEnv

    from rlinf_tpu.envs.adapters import CalvinEnv

    def mk(rank):
        fake = FakeCalvinVectorEnv(num_envs=2)
        env = CalvinEnv(2, seed=0, env_factory=lambda: fake,
                        benchmark=FakeCalvinBenchmark(),
                        num_reset_states=32, partition_rank=rank,
                        partition_size=4)
        return env

    e0, e1 = mk(0), mk(1)
    assert not set(e0._state_ids.tolist()) & set(e1._state_ids.tolist())
    assert len(e0._state_ids) == 8


# ---------------------------------------------------------------------------
# BEHAVIOR (tier 3)
# ---------------------------------------------------------------------------


def test_behavior_chunk_step_conventions():
    from fake_sims import FakeBehaviorPool

    from rlinf_tpu.envs.adapters import BehaviorEnv

    fake = FakeBehaviorPool(num_envs=4, success_at=4)
    env = BehaviorEnv(4, env_factory=lambda: fake, max_episode_steps=50,
                      reward_coef=2.0)
    obs = env.reset()
    assert obs["main_images"].shape == (4, 8, 8, 3)
    assert obs["wrist_images"].shape == (4, 2, 8, 8, 3)
    assert obs["states"].shape == (4, 32)
    assert obs["task_descriptions"][0] == "putting away groceries"

    a = np.zeros((4, 3, 23), np.float32)   # chunk of 3
    obs, rew, term, trunc, info = env.chunk_step(a)
    assert rew.shape == (4, 3)
    np.testing.assert_allclose(rew[:, 0], 0.1)   # 2.0 * 0.05 shaping
    assert not term.any()
    obs, rew, term, trunc, info = env.chunk_step(a)  # t reaches 4 mid-chunk
    # term collapsed to the LAST chunk column only
    assert term[:, :-1].sum() == 0 and term[:, -1].all()
    m = env.metrics()
    assert m["env/success_once"] == 1.0


def test_behavior_info_done_fallback():
    from fake_sims import FakeBehaviorPool

    from rlinf_tpu.envs.adapters import BehaviorEnv

    fake = FakeBehaviorPool(num_envs=2, success_at=2, info_done_only=True)
    env = BehaviorEnv(2, env_factory=lambda: fake, ignore_terminations=True)
    env.reset()
    a = np.zeros((2, 2, 23), np.float32)
    obs, rew, term, trunc, info = env.chunk_step(a)
    # info-done maps into truncations under ignore_terminations
    assert not term.any() and trunc[:, -1].all()


# ---------------------------------------------------------------------------
# RoboCasa (tier 3)
# ---------------------------------------------------------------------------


def test_robocasa_obs_and_sparse_reward():
    from fake_sims import FakeRoboCasaEnv

    from rlinf_tpu.envs.adapters import RoboCasaEnv

    fake = FakeRoboCasaEnv(num_envs=4, success_at=3)
    env = RoboCasaEnv(4, env_factory=lambda: fake, max_episode_steps=20)
    obs = env.reset()
    assert set(obs) >= {"main_images", "wrist_images", "extra_images",
                        "states", "task_descriptions"}
    assert obs["task_descriptions"][0] == "pick the bowl"
    a = np.zeros((4, 12), np.float32)
    out = env.step(a)
    np.testing.assert_allclose(out.reward, 0.0)
    env.step(a)
    out = env.step(a)   # success via info at t=3
    np.testing.assert_allclose(out.reward, 1.0)
    assert out.done.all() and out.info["success"].all()
    assert env.metrics()["env/success_once"] == 1.0


# ---------------------------------------------------------------------------
# Habitat (tier 3)
# ---------------------------------------------------------------------------


def test_habitat_stop_substitution_and_noop_steps():
    from fake_sims import FakeHabitatEnv

    from rlinf_tpu.envs.adapters import HabitatEnv

    fake = FakeHabitatEnv(num_envs=3, end_at=5)
    env = HabitatEnv(3, env_factory=lambda: fake, max_episode_steps=20)
    obs = env.reset()
    assert obs["main_images"].shape == (3, 8, 8, 3)
    assert obs["task_descriptions"][0] == "find the chair"

    fwd = env.ACTIONS.index("move_forward")
    noop = env.ACTIONS.index("no_op")
    stop = env.ACTIONS.index("stop")
    # no_op does not advance elapsed steps
    env.step(np.array([noop, fwd, fwd]))
    np.testing.assert_array_equal(env._elapsed, [0, 1, 1])
    # stop: terminates THAT env, sim receives no_op (fake asserts)
    out = env.step(np.array([stop, fwd, fwd]))
    assert out.terminated[0] and not out.terminated[1:].any()
    np.testing.assert_allclose(out.reward, [1.0, 0.0, 0.0])
    # stopped env auto-reset; others continue
    np.testing.assert_array_equal(env._elapsed, [0, 2, 2])
