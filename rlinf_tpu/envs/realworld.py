"""Real-robot environment layer: drivers, auto-config, rate-limited env.

Reference analog: rlinf/envs/realworld/ (RealWorldEnv over Franka/DOSW1/
Turtle2 drivers, cameras, teleop) + the robots-as-hardware registry with
env-var auto-config (rlinf/scheduler/hardware/robots/*.py,
auto_config.py). In the mesh design robots are HOST-side devices attached
to whichever process runs the env loop — no scheduler integration is
needed; what carries over is:

  * ``RobotDriver`` / ``CameraDriver`` protocols (connect, state, action,
    home) with a pure-python ``SimulatedArmDriver`` for tests and dry-runs
    (the analog of the reference's fake-cluster robot autoconfig test,
    tests/unit_tests/_robot_autoconfig_cluster.py).
  * ``RobotAutoConfig.resolve``: fill unset robot IPs / camera serials from
    ``ROBOT_IP`` / ``CAMERA_SERIAL`` env vars, one value per robot
    (comma-separated), mirroring auto_config.py's count-field resolution.
  * ``RealWorldEnv``: VectorEnv contract over one driver — control-rate
    limiting, action clamping to limits, episode horizon, optional cameras,
    pluggable reward/success fn (realworld reward is typically a classifier
    or human signal).
  * ``record_teleop_episodes``: teleop -> LeRobot dataset export (the
    collect_real_data.py flow).

Hardware drivers (Franka via panda-py/frankx etc.) are import-gated: the
module loads without robot SDKs installed.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from rlinf_tpu.envs import register_env
from rlinf_tpu.envs.base import EnvOutput, VectorEnv


# ---------------------------------------------------------------------------
# Driver protocols + configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RobotConfig:
    robot_type: str = "simulated"
    robot_ip: Optional[str] = None
    camera_serials: Sequence[str] = ()
    control_hz: float = 10.0
    action_dim: int = 7
    state_dim: int = 7
    action_low: float = -1.0
    action_high: float = 1.0


class RobotDriver:
    """One physical (or simulated) robot arm."""

    def __init__(self, cfg: RobotConfig):
        self.cfg = cfg

    def connect(self) -> None: ...
    def disconnect(self) -> None: ...

    def get_state(self) -> np.ndarray:
        raise NotImplementedError

    def send_action(self, action: np.ndarray) -> None:
        raise NotImplementedError

    def reset_to_home(self) -> None:
        raise NotImplementedError


class CameraDriver:
    def read(self) -> np.ndarray:  # [H, W, 3] uint8
        raise NotImplementedError


_DRIVER_REGISTRY: Dict[str, type] = {}


def register_robot(name: str):
    def deco(cls):
        _DRIVER_REGISTRY[name] = cls
        return cls
    return deco


def get_robot_driver(cfg: RobotConfig) -> RobotDriver:
    try:
        cls = _DRIVER_REGISTRY[cfg.robot_type]
    except KeyError:
        raise KeyError(
            f"Unknown robot {cfg.robot_type!r}; have {sorted(_DRIVER_REGISTRY)}"
        ) from None
    return cls(cfg)


@register_robot("simulated")
class SimulatedArmDriver(RobotDriver):
    """Pure-python joint-space integrator: state += dt * action, clamped.
    Stands in for real hardware in tests and preflight checks."""

    def __init__(self, cfg: RobotConfig):
        super().__init__(cfg)
        self._state = np.zeros(cfg.state_dim, np.float32)
        self._connected = False

    def connect(self):
        self._connected = True

    def disconnect(self):
        self._connected = False

    def get_state(self) -> np.ndarray:
        assert self._connected, "driver not connected"
        return self._state.copy()

    def send_action(self, action: np.ndarray) -> None:
        assert self._connected
        a = np.clip(np.asarray(action, np.float32)[: self.cfg.state_dim],
                    self.cfg.action_low, self.cfg.action_high)
        self._state = np.clip(
            self._state + a / self.cfg.control_hz, -3.0, 3.0
        )

    def reset_to_home(self) -> None:
        self._state[:] = 0.0


@register_robot("franka")
class FrankaDriver(RobotDriver):
    """Franka Panda via panda-py (import-gated; reference
    envs/realworld/franka/franka_controller.py)."""

    def __init__(self, cfg: RobotConfig):
        super().__init__(cfg)
        try:
            import panda_py  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "FrankaDriver requires panda-py; install it on the robot "
                "controller host"
            ) from e
        assert cfg.robot_ip, "franka requires robot_ip (set ROBOT_IP)"
        import panda_py

        self._panda = panda_py.Panda(cfg.robot_ip)

    def get_state(self) -> np.ndarray:
        return np.asarray(self._panda.get_state().q, np.float32)

    def send_action(self, action: np.ndarray) -> None:
        a = np.clip(action, self.cfg.action_low, self.cfg.action_high)
        self._panda.move_to_joint_position(
            self.get_state() + a / self.cfg.control_hz
        )

    def reset_to_home(self) -> None:
        self._panda.move_to_start()


# ---------------------------------------------------------------------------
# Auto-config (env-var resolution, reference auto_config.py semantics)
# ---------------------------------------------------------------------------

class RobotAutoConfig:
    @staticmethod
    def resolve(configs: List[RobotConfig]) -> List[RobotConfig]:
        """Fill unset robot_ip / camera_serials from ROBOT_IP /
        CAMERA_SERIAL env vars (comma-separated, one per robot). With no
        configs at all, create one per ROBOT_IP entry."""
        ips = [s for s in os.environ.get("ROBOT_IP", "").split(",") if s]
        serials = [s for s in os.environ.get("CAMERA_SERIAL", "").split(",") if s]
        if not configs and ips:
            configs = [RobotConfig(robot_type="franka") for _ in ips]
        ip_iter = iter(ips)
        for cfg in configs:
            if cfg.robot_ip is None:
                cfg.robot_ip = next(ip_iter, None)
            if not cfg.camera_serials and serials:
                cfg.camera_serials = tuple(serials)
        return configs


# ---------------------------------------------------------------------------
# Env
# ---------------------------------------------------------------------------

@register_env("realworld")
class RealWorldEnv(VectorEnv):
    """VectorEnv over ONE robot driver (num_envs == 1, matching the
    reference's one-robot-per-worker constraint, realworld_env.py:36)."""

    def __init__(
        self,
        num_envs: int = 1,
        seed: int = 0,
        robot_cfg: Optional[RobotConfig] = None,
        cameras: Optional[Dict[str, CameraDriver]] = None,
        reward_fn: Optional[Callable[[np.ndarray, Dict], float]] = None,
        max_episode_steps: int = 100,
        rate_limit: bool = True,
    ):
        assert num_envs == 1, "one realworld env per driver"
        super().__init__(num_envs, seed)
        self.robot_cfg = robot_cfg or RobotConfig()
        self.driver = get_robot_driver(self.robot_cfg)
        self.driver.connect()
        self.cameras = cameras or {}
        self.reward_fn = reward_fn
        self.max_episode_steps = max_episode_steps
        self.rate_limit = rate_limit
        self.action_dim = self.robot_cfg.action_dim
        self.obs_spec = {"states": (self.robot_cfg.state_dim,)}
        self._t = 0
        self._last_step_time = 0.0
        self._ep_return = 0.0
        self._ep_success: List[bool] = []
        self._ep_returns: List[float] = []

    def _obs(self) -> Dict[str, np.ndarray]:
        obs = {"states": self.driver.get_state()[None]}
        for name, cam in self.cameras.items():
            obs[name] = cam.read()[None]
        return obs

    def reset(self) -> Dict[str, np.ndarray]:
        self.driver.reset_to_home()
        self._t = 0
        self._ep_return = 0.0
        return self._obs()

    def step(self, actions: np.ndarray) -> EnvOutput:
        # control-rate limiting: hold the loop to control_hz
        if self.rate_limit:
            period = 1.0 / self.robot_cfg.control_hz
            dt = time.monotonic() - self._last_step_time
            if dt < period:
                time.sleep(period - dt)
            self._last_step_time = time.monotonic()
        self.driver.send_action(np.asarray(actions, np.float32)[0])
        obs = self._obs()
        reward = 0.0
        success = False
        if self.reward_fn is not None:
            r = self.reward_fn(np.asarray(actions)[0], obs)
            reward, success = (r if isinstance(r, tuple) else (r, r > 0.5))
        self._t += 1
        self._ep_return += reward
        truncated = self._t >= self.max_episode_steps
        done = bool(success) or truncated
        final_obs = obs
        if done:
            self._ep_success.append(bool(success))
            self._ep_returns.append(self._ep_return)
            obs = self.reset()
        return EnvOutput(
            obs=obs,
            reward=np.array([reward], np.float32),
            done=np.array([done]),
            terminated=np.array([bool(success)]),
            info={"final_obs": final_obs, "success": np.array([success])},
        )

    def metrics(self) -> Dict[str, float]:
        out = {}
        if self._ep_success:
            out["env/success_once"] = float(np.mean(self._ep_success))
            out["env/episode_return"] = float(np.mean(self._ep_returns))
            out["env/num_episodes"] = float(len(self._ep_success))
            self._ep_success.clear()
            self._ep_returns.clear()
        return out

    def close(self):
        self.driver.disconnect()


# ---------------------------------------------------------------------------
# Teleop data collection -> LeRobot export
# ---------------------------------------------------------------------------

def record_teleop_episodes(
    env: RealWorldEnv,
    teleop_fn: Callable[[Dict[str, np.ndarray]], np.ndarray],
    writer,
    *,
    num_episodes: int,
    task: str = "",
) -> int:
    """Drive the env with a teleop callable (GELLO/SpaceMouse/keyboard in
    the reference, any obs->action fn here) and export finished episodes to
    a ``LeRobotDatasetWriter`` (reference collect_real_data.py flow).
    Returns frames written."""
    frames = 0
    for _ in range(num_episodes):
        obs = env.reset()
        states, actions, rewards, dones = [], [], [], []
        images: Dict[str, list] = {k: [] for k in env.cameras}
        done = False
        while not done:
            a = np.asarray(teleop_fn(obs), np.float32)
            states.append(obs["states"][0])
            for k in images:
                images[k].append(obs[k][0])
            out = env.step(a[None])
            actions.append(a)
            rewards.append(float(out.reward[0]))
            dones.append(bool(out.done[0]))
            done = bool(out.done[0])
            obs = out.obs
        writer.add_episode(
            states=np.stack(states),
            actions=np.stack(actions),
            task=task,
            images={k: np.stack(v) for k, v in images.items()} or None,
            rewards=np.asarray(rewards, np.float32),
            dones=np.asarray(dones, bool),
        )
        frames += len(actions)
    return frames
