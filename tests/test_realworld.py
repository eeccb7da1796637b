"""Realworld layer: simulated driver env contract, auto-config, teleop
recording -> LeRobot export, RL loop over the simulated robot."""

import numpy as np
import pytest

from rlinf_tpu.data.lerobot_writer import (
    LeRobotDatasetWriter,
    read_lerobot_episode,
)
from rlinf_tpu.envs import get_env_cls
from rlinf_tpu.envs.realworld import (
    CameraDriver,
    RealWorldEnv,
    RobotAutoConfig,
    RobotConfig,
    get_robot_driver,
    record_teleop_episodes,
)


class FakeCamera(CameraDriver):
    def read(self):
        return np.zeros((8, 8, 3), np.uint8)


def _env(**kw):
    cfg = RobotConfig(robot_type="simulated", state_dim=3, action_dim=3,
                      control_hz=100.0)
    return RealWorldEnv(robot_cfg=cfg, rate_limit=False, **kw)


def test_simulated_driver_env_contract():
    env = _env(max_episode_steps=5)
    assert get_env_cls("realworld") is RealWorldEnv
    obs = env.reset()
    assert obs["states"].shape == (1, 3)
    for _ in range(5):
        out = env.step(np.ones((1, 3), np.float32))
    assert bool(out.done[0])  # truncation at horizon
    m = env.metrics()
    assert m["env/num_episodes"] == 1
    env.close()


def test_driver_action_clamp_and_home():
    cfg = RobotConfig(robot_type="simulated", state_dim=2, action_dim=2,
                      control_hz=1.0, action_high=0.5, action_low=-0.5)
    d = get_robot_driver(cfg)
    d.connect()
    d.send_action(np.array([10.0, -10.0]))  # clamped to +-0.5
    np.testing.assert_allclose(d.get_state(), [0.5, -0.5])
    d.reset_to_home()
    np.testing.assert_allclose(d.get_state(), [0.0, 0.0])


def test_autoconfig_from_env_vars(monkeypatch):
    monkeypatch.setenv("ROBOT_IP", "10.0.0.1,10.0.0.2")
    monkeypatch.setenv("CAMERA_SERIAL", "cam0")
    # explicit config list: fill unset ips one per robot
    cfgs = [RobotConfig(robot_type="franka"), RobotConfig(robot_type="franka")]
    out = RobotAutoConfig.resolve(cfgs)
    assert [c.robot_ip for c in out] == ["10.0.0.1", "10.0.0.2"]
    assert out[0].camera_serials == ("cam0",)
    # no configs: one per ROBOT_IP entry
    created = RobotAutoConfig.resolve([])
    assert len(created) == 2 and created[1].robot_ip == "10.0.0.2"


def test_franka_driver_import_gated():
    with pytest.raises(ImportError):
        get_robot_driver(RobotConfig(robot_type="franka", robot_ip="1.2.3.4"))


def test_reward_fn_success_terminates():
    env = _env(max_episode_steps=50,
               reward_fn=lambda a, obs: (1.0, obs["states"][0, 0] > 0.02))
    env.reset()
    done = False
    steps = 0
    while not done and steps < 50:
        out = env.step(np.ones((1, 3), np.float32))
        done = bool(out.done[0])
        steps += 1
    assert bool(out.terminated[0]) and steps < 50


def test_teleop_recording_exports_lerobot(tmp_path):
    env = _env(max_episode_steps=4, cameras={"images": FakeCamera()})
    w = LeRobotDatasetWriter().create(str(tmp_path / "tele"), fps=10)
    frames = record_teleop_episodes(
        env, lambda obs: np.full(3, 0.1, np.float32), w,
        num_episodes=2, task="touch target",
    )
    w.finalize()
    assert frames == 8
    ep = read_lerobot_episode(str(tmp_path / "tele"), 1)
    assert ep["action"].shape == (4, 3)
    assert ep["observation.images.images"].shape == (4, 8, 8, 3)


def test_rl_learns_on_simulated_robot():
    """PPO through the standard embodied runner on the simulated driver —
    the realworld env speaks the same VectorEnv contract as the sims."""
    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from rlinf_tpu.models.embodiment import MLPGaussianPolicy
    from rlinf_tpu.runners.embodied_runner import (
        EmbodiedRunner, EmbodiedRunnerConfig,
    )
    from rlinf_tpu.training.train_state import OptimizerConfig

    # a fleet of simulated robots: one RealWorldEnv per driver, run as
    # stages of the pipelined EnvLoop (how multiple physical arms attach)
    def make_env():
        cfg_robot = RobotConfig(robot_type="simulated", state_dim=3,
                                action_dim=3, control_hz=5.0)
        return RealWorldEnv(
            robot_cfg=cfg_robot, rate_limit=False, max_episode_steps=16,
            reward_fn=lambda a, obs: (
                float(-np.sum((obs["states"][0] - 0.5) ** 2)), False),
        )

    envs = [make_env() for _ in range(8)]
    policy = MLPGaussianPolicy(obs_dim=3, action_dim=3, init_logstd=-0.5)
    cfg = EmbodiedRunnerConfig(num_chunk_steps=16, num_epochs=2,
                               num_mini_batches=2, gamma=0.9,
                               max_steps=40, seed=0)
    runner = EmbodiedRunner(cfg, envs, policy,
                            optimizer=OptimizerConfig(lr=3e-3, clip_grad=1.0))
    hist = runner.run(max_steps=40)
    early = np.mean([h["rollout/reward_mean"] for h in hist[:5]])
    late = np.mean([h["rollout/reward_mean"] for h in hist[-5:]])
    assert late > early + 0.05, f"no improvement {early:.4f} -> {late:.4f}"
