"""Fake simulator modules for exercising the named env adapters.

VERDICT r3 item 7: the per-sim obs/reward/success mapping code is the part
that breaks in practice, and the real sims aren't installable here — so
these fakes implement the sims' *API surfaces* faithfully enough that the
adapters' mapping logic actually runs in CI:

  * fake ``mani_skill``: ManiSkill3's native batched-torch API (gym.make
    with num_envs, torch obs/reward/done, sensor_data rgb dict, partial
    reset via options={"env_idx"}, info keys is_src_obj_grasped /
    consecutive_grasp / success);
  * fake ``metaworld``: MT1 + set_task + float info["success"] + render();
  * fake ``libero``: benchmark dict + OffScreenRenderEnv + check_success().
"""

from __future__ import annotations

import sys
import types

import numpy as np


# ---------------------------------------------------------------------------
# ManiSkill3
# ---------------------------------------------------------------------------


import gymnasium as _gym


class FakeManiSkillBatchedEnv(_gym.Env):
    """Mimics ManiSkill3's GPU-vectorized BaseEnv: every array is a torch
    tensor, success becomes True after ``success_after`` steps, truncation
    at ``horizon``."""

    def __init__(self, num_envs=4, obs_mode="state",
                 control_mode="pd_ee_delta_pose", success_after=3,
                 horizon=6, **kw):
        import torch

        self.torch = torch
        self.num_envs = num_envs
        self.obs_mode = obs_mode
        self._t = torch.zeros(num_envs, dtype=torch.long)
        self._success_after = success_after
        self._horizon = horizon
        import gymnasium as gym

        self.single_action_space = gym.spaces.Box(-1, 1, (7,), np.float32)
        self.action_space = gym.spaces.Box(
            -1, 1, (num_envs, 7), np.float32)
        self.agent = types.SimpleNamespace(
            robot=types.SimpleNamespace(
                get_qpos=lambda: self.torch.arange(
                    num_envs * 9, dtype=self.torch.float32
                ).reshape(num_envs, 9)
            )
        )
        self.reset_calls = []

    def _obs(self):
        t = self.torch
        if self.obs_mode == "state":
            return t.stack(
                [self._t.float()] * 5, dim=1
            )  # [B, 5] state vector
        return {
            "sensor_data": {
                "base_camera": {
                    "rgb": t.zeros(
                        (self.num_envs, 8, 8, 3), dtype=t.uint8
                    ) + self._t.reshape(-1, 1, 1, 1).to(t.uint8)
                }
            },
            "sensor_param": {},
            "agent": {},
        }

    def reset(self, seed=None, options=None):
        options = options or {}
        self.reset_calls.append(options)
        if "env_idx" in options:
            idx = np.asarray(options["env_idx"])
            self._t[idx] = 0
        else:
            self._t[:] = 0
        return self._obs(), {}

    def step(self, actions):
        t = self.torch
        self._t += 1
        succ = self._t >= self._success_after
        grasped = self._t >= 1          # grasp from the first step
        consec = self._t >= 2
        reward = t.ones(self.num_envs)  # raw sim reward
        term = succ.clone()
        trunc = self._t >= self._horizon
        info = {
            "success": succ,
            "is_src_obj_grasped": grasped,
            "consecutive_grasp": consec,
        }
        return self._obs(), reward, term, trunc, info

    def close(self):
        pass


def install_fake_mani_skill(monkeypatch, **env_kw):
    """Register fake modules + a fake gymnasium id; returns the env id."""
    import gymnasium as gym

    mod = types.ModuleType("mani_skill")
    envs_mod = types.ModuleType("mani_skill.envs")
    mod.envs = envs_mod
    monkeypatch.setitem(sys.modules, "mani_skill", mod)
    monkeypatch.setitem(sys.modules, "mani_skill.envs", envs_mod)
    env_id = "FakePickCube-v1"
    if env_id not in gym.registry:
        gym.register(
            id=env_id,
            entry_point=lambda **kw: FakeManiSkillBatchedEnv(**kw),
            disable_env_checker=True,
        )
    return env_id


# ---------------------------------------------------------------------------
# Metaworld
# ---------------------------------------------------------------------------


class FakeMetaworldEnv:
    def __init__(self):
        import gymnasium as gym

        self.action_space = gym.spaces.Box(-1, 1, (4,), np.float32)
        self.task = None
        self._t = 0

    def set_task(self, task):
        self.task = task

    def reset(self):
        self._t = 0
        return np.zeros(39, np.float32), {}

    def step(self, a):
        self._t += 1
        success = 1.0 if self._t >= 2 else 0.0
        state = np.full(39, self._t, np.float32)
        return state, 0.5, False, False, {"success": success}

    def render(self):
        img = np.zeros((8, 8, 3), np.uint8)
        img[0, 0] = 255  # corner marker: the adapter must flip [::-1, ::-1]
        return img


def install_fake_metaworld(monkeypatch):
    mod = types.ModuleType("metaworld")

    class MT1:
        def __init__(self, env_name, seed=0):
            self.train_classes = {env_name: FakeMetaworldEnv}
            self.train_tasks = [
                types.SimpleNamespace(env_name=env_name, data=i)
                for i in range(5)
            ]

    mod.MT1 = MT1
    monkeypatch.setitem(sys.modules, "metaworld", mod)


# ---------------------------------------------------------------------------
# LIBERO
# ---------------------------------------------------------------------------


class FakeOffScreenRenderEnv:
    def __init__(self, bddl_file_name=None, camera_heights=128,
                 camera_widths=128, **kw):
        self.bddl = bddl_file_name
        self.h, self.w = camera_heights, camera_widths
        self._t = 0
        self._seed = None
        self.init_state_set = None

    def seed(self, s):
        self._seed = s

    def _raw_obs(self):
        img = np.zeros((self.h, self.w, 3), np.uint8)
        img[0, :, 0] = 255  # top row marker: adapter must flip [::-1]
        return {
            "agentview_image": img,
            "robot0_eye_in_hand_image": np.ones(
                (self.h, self.w, 3), np.uint8),
            "robot0_eef_pos": np.array([0.1, 0.2, 0.3], np.float32),
            "robot0_eef_quat": np.array([0, 0, 0, 1], np.float32),
            "robot0_gripper_qpos": np.array([0.01, -0.01], np.float32),
        }

    def reset(self):
        self._t = 0
        return self._raw_obs()

    def set_init_state(self, state):
        self.init_state_set = np.asarray(state)
        return self._raw_obs()

    def step(self, a):
        self._t += 1
        return self._raw_obs(), 0.0, False, {}

    def check_success(self):
        return self._t >= 4

    def close(self):
        pass


def install_fake_libero(monkeypatch, tmp_path):
    libero_pkg = types.ModuleType("libero")
    libero_sub = types.ModuleType("libero.libero")
    envs_mod = types.ModuleType("libero.libero.envs")

    class FakeSuite:
        def get_task(self, task_id):
            return types.SimpleNamespace(
                problem_folder="spatial",
                bddl_file="task0.bddl",
                language="put the bowl on the plate",
            )

        def get_task_init_states(self, task_id):
            return np.arange(3 * 4, dtype=np.float32).reshape(3, 4)

    benchmark = types.SimpleNamespace(
        get_benchmark_dict=lambda: {"libero_spatial": FakeSuite}
    )
    libero_sub.benchmark = benchmark
    libero_sub.get_libero_path = lambda key: str(tmp_path)
    envs_mod.OffScreenRenderEnv = FakeOffScreenRenderEnv
    libero_pkg.libero = libero_sub
    libero_sub.envs = envs_mod
    monkeypatch.setitem(sys.modules, "libero", libero_pkg)
    monkeypatch.setitem(sys.modules, "libero.libero", libero_sub)
    monkeypatch.setitem(sys.modules, "libero.libero.envs", envs_mod)


# ---------------------------------------------------------------------------
# IsaacLab (tier 2): torch-tensor manager-based env — policy obs group with
# table/wrist cams + eef pose, termination (success) at step 3.
# ---------------------------------------------------------------------------


class FakeIsaacLabEnv:
    def __init__(self, num_envs=4, action_dim=7, success_at=3):
        self.num_envs = num_envs
        self.action_dim = action_dim
        self._success_at = success_at
        self._t = np.zeros(num_envs, np.int64)
        self.reset_calls = []
        self.closed = False

    def _obs(self):
        import torch

        N = self.num_envs
        t = torch.as_tensor(self._t, dtype=torch.float32)
        return {"policy": {
            "table_cam": torch.zeros(N, 8, 8, 3),
            "wrist_cam": torch.ones(N, 8, 8, 3),
            "eef_pos": torch.stack([t, t, t], dim=1) * 0.1,
            # wxyz identity quaternion
            "eef_quat": torch.tensor([[1.0, 0, 0, 0]]).repeat(N, 1),
            "gripper_pos": torch.zeros(N, 2),
        }}

    def reset(self, seed=None, env_ids=None):
        if env_ids is None:
            self._t[:] = 0
        else:
            self._t[np.asarray(env_ids)] = 0
        self.reset_calls.append({"seed": seed, "env_ids": env_ids})
        return self._obs(), {}

    def step(self, actions):
        import torch

        self._t += 1
        term = torch.as_tensor(self._t >= self._success_at)
        trunc = torch.zeros(self.num_envs, dtype=torch.bool)
        reward = term.float()  # raw sim reward (unused by the adapter)
        return self._obs(), reward, term, trunc, {}

    def close(self):
        self.closed = True


# ---------------------------------------------------------------------------
# RoboTwin (tier 2): seed-addressed vector env with per-env obs dicts
# (head camera + dual wrist cams + state); success iff the episode seed is
# in a curated "success" set.
# ---------------------------------------------------------------------------


class FakeRoboTwinVectorEnv:
    def __init__(self, task_config=None, n_envs=4, env_seeds=None,
                 success_at=2):
        self.task_config = task_config or {}
        self.num_envs = n_envs
        self.action_dim = 14
        self._seeds = list(env_seeds or range(n_envs))
        self._success_at = success_at
        self._t = np.zeros(n_envs, np.int64)
        self.reset_calls = []
        self.closed = False

    def reset(self, env_idx=None, env_seeds=None):
        self.reset_calls.append({"env_idx": env_idx, "env_seeds": env_seeds})
        if env_idx is None:
            self._t[:] = 0
            if env_seeds is not None:
                self._seeds = list(env_seeds)
        else:
            for j, i in enumerate(env_idx):
                self._t[i] = 0
                if env_seeds is not None:
                    self._seeds[i] = env_seeds[j]

    def get_obs(self):
        return [{
            "observation": np.zeros((8, 8, 3), np.uint8),
            "left_wrist_image": np.ones((8, 8, 3), np.uint8),
            "right_wrist_image": np.ones((8, 8, 3), np.uint8) * 2,
            "state": np.full((14,), float(self._t[i]), np.float32),
        } for i in range(self.num_envs)]

    def step(self, actions):
        assert actions.ndim == 3, "RoboTwin takes [n, horizon, action_dim]"
        self._t += actions.shape[1]
        # success only on even seeds (mimics curated success seeds)
        term = (self._t >= self._success_at) & (
            np.asarray(self._seeds) % 2 == 0)
        trunc = np.zeros(self.num_envs, bool)
        infos = [{"success": bool(t)} for t in term]
        return self.get_obs(), term.astype(np.float32), term, trunc, infos

    def close(self):
        self.closed = True


# ---------------------------------------------------------------------------
# CALVIN (tier 2): 5-subtask language chains; subtask k of state id s
# completes at step k+1 (so a full chain takes 5 steps).
# ---------------------------------------------------------------------------


class FakeCalvinBenchmark:
    SUBTASKS = ["open_drawer", "move_slider_left", "lift_red_block",
                "place_in_drawer", "push_blue_block"]

    def get_task_chain(self, state_id):
        k = state_id % len(self.SUBTASKS)
        return self.SUBTASKS[k:] + self.SUBTASKS[:k]

    def get_description(self, subtask):
        return f"please {subtask.replace('_', ' ')}"

    def check_subtask_success(self, prev_info, info, subtask):
        return info.get("completed") == subtask


class FakeCalvinVectorEnv:
    def __init__(self, num_envs=4, benchmark=None, chains=None):
        self.num_envs = num_envs
        self.action_dim = 7
        self._t = np.zeros(num_envs, np.int64)
        self.adapter = None  # set by test to read assigned chains
        self.closed = False

    def reset(self, env_idx=None, state_ids=None):
        if env_idx is None:
            self._t[:] = 0
        else:
            self._t[np.asarray(env_idx)] = 0

    def get_obs(self):
        return [{
            "rgb_static": np.zeros((8, 8, 3), np.uint8),
            "rgb_gripper": np.ones((8, 8, 3), np.uint8),
            "robot_obs": np.full((15,), float(self._t[i]), np.float32),
        } for i in range(self.num_envs)]

    def step(self, actions):
        self._t += 1
        infos = []
        for i in range(self.num_envs):
            # the env completes whatever subtask the adapter is announcing
            seq = self.adapter._task_seq[i]
            k = min(int(self.adapter._task_idx[i]), 4)
            infos.append({"completed": seq[k]})
        return self.get_obs(), infos

    def close(self):
        self.closed = True


# ---------------------------------------------------------------------------
# BEHAVIOR (tier 3): chunk-step process-pool slice surface; info-done
# fallback builds leave term/trunc False and set info["done"].
# ---------------------------------------------------------------------------


class FakeBehaviorPool:
    def __init__(self, num_envs=4, success_at=4, info_done_only=False):
        self.num_envs = num_envs
        self.action_dim = 23
        self._t = np.zeros(num_envs, np.int64)
        self._success_at = success_at
        self._info_done_only = info_done_only
        self.reset_calls = []
        self.closed = False

    def _obs(self):
        return [{
            "zed": np.zeros((8, 8, 3), np.uint8),
            "left_realsense": np.ones((8, 8, 3), np.uint8),
            "right_realsense": np.ones((8, 8, 3), np.uint8) * 2,
            "proprio": np.full((32,), float(self._t[i]), np.float32),
        } for i in range(self.num_envs)]

    def reset(self, env_idx=None):
        self.reset_calls.append(env_idx)
        if env_idx is None:
            self._t[:] = 0
        else:
            self._t[np.asarray(env_idx)] = 0
        return self._obs()

    def chunk_step(self, actions):
        N, K, _ = actions.shape
        obs_l, rew_l, term_l, trunc_l, info_l = [], [], [], [], []
        for k in range(K):
            self._t += 1
            done = self._t >= self._success_at
            rew_l.append(np.where(done, 1.0, 0.05).astype(np.float32))
            if self._info_done_only:
                term_l.append(np.zeros(N, bool))
                info_l.append([{"done": bool(d)} for d in done])
            else:
                term_l.append(done.copy())
                info_l.append([{} for _ in range(N)])
            trunc_l.append(np.zeros(N, bool))
            obs_l.append(self._obs())
        return obs_l, rew_l, term_l, trunc_l, info_l

    def close(self):
        self.closed = True


# ---------------------------------------------------------------------------
# RoboCasa (tier 3): per-env obs dicts with 3 cameras + per-env info task
# descriptions; success via info at step `success_at`.
# ---------------------------------------------------------------------------


class FakeRoboCasaEnv:
    def __init__(self, num_envs=4, success_at=3):
        self.num_envs = num_envs
        self.action_dim = 12
        self._t = np.zeros(num_envs, np.int64)
        self._success_at = success_at
        self.closed = False

    def _obs(self):
        return [{
            "robot0_agentview_left_image": np.zeros((8, 8, 3), np.uint8),
            "robot0_eye_in_hand_image": np.ones((8, 8, 3), np.uint8),
            "robot0_agentview_right_image": np.ones((8, 8, 3), np.uint8) * 2,
            "state": np.full((20,), float(self._t[i]), np.float32),
        } for i in range(self.num_envs)]

    def _infos(self):
        return [{"task_description": "pick the bowl",
                 "success": bool(self._t[i] >= self._success_at)}
                for i in range(self.num_envs)]

    def reset(self, env_idx=None):
        if env_idx is None:
            self._t[:] = 0
        else:
            self._t[np.asarray(env_idx)] = 0
        return self._obs(), self._infos()

    def step(self, actions):
        self._t += 1
        term = np.zeros(self.num_envs, bool)
        return self._obs(), term, self._infos()

    def close(self):
        self.closed = True


# ---------------------------------------------------------------------------
# Habitat (tier 3): discrete string actions; sim ends an episode at step 5.
# ---------------------------------------------------------------------------


class FakeHabitatEnv:
    def __init__(self, num_envs=4, end_at=5):
        self.num_envs = num_envs
        self._t = np.zeros(num_envs, np.int64)
        self._end_at = end_at
        self.seen_actions: list = []
        self.closed = False

    def _obs(self):
        return [{
            "rgb": np.zeros((8, 8, 3), np.uint8),
            "instruction": "find the chair",
        } for _ in range(self.num_envs)]

    def reset(self, env_idx=None):
        if env_idx is None:
            self._t[:] = 0
            return self._obs()
        self._t[np.asarray(env_idx)] = 0
        return [self._obs()[0] for _ in env_idx]

    def step(self, action_names):
        self.seen_actions.append(list(action_names))
        assert "stop" not in action_names, "stop must be no_op-substituted"
        for i, a in enumerate(action_names):
            if a != "no_op":
                self._t[i] += 1
        term = self._t >= self._end_at
        return self._obs(), term

    def close(self):
        self.closed = True
