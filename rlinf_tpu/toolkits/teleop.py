"""Teleoperation data-collection pipeline (device-agnostic).

Reference analog: toolkits/ GELLO / SpaceMouse / PICO-VR teleop stacks and
realworld_check/collect_monitor.py — each a hardware driver feeding the
same collection loop. The hardware drivers are device-bound; THIS module is
the part that generalizes: a ``TeleopDevice`` protocol, axis retargeting
(device pose deltas -> robot action space with scaling/deadband/clipping),
a fixed-rate collection loop with episode start/stop/success marking, and
LeRobot episode output (data/lerobot_writer.py). Any device becomes a
collector by implementing ``read() -> TeleopFrame``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, List, Optional, Protocol

import numpy as np


@dataclasses.dataclass
class TeleopFrame:
    """One device poll: a relative pose delta + gripper + buttons."""

    delta: np.ndarray            # [D] device-space motion since last poll
    gripper: float = 0.0         # 0 open .. 1 closed
    buttons: Dict[str, bool] = dataclasses.field(default_factory=dict)


class TeleopDevice(Protocol):
    def read(self) -> TeleopFrame: ...


@dataclasses.dataclass
class RetargetConfig:
    """Device deltas -> robot action mapping."""

    scale: float = 1.0
    deadband: float = 0.0        # |delta| below this is zeroed per-axis
    clip: float = 1.0            # per-axis action clip
    axis_map: Optional[List[int]] = None   # device axis -> action axis
    flip: Optional[List[int]] = None       # action axes to negate


def retarget(frame: TeleopFrame, cfg: RetargetConfig,
             action_dim: int) -> np.ndarray:
    """Map a device frame onto a [action_dim] action (last slot = gripper
    when the device provides one)."""
    d = np.asarray(frame.delta, np.float32)
    if cfg.axis_map is not None:
        out = np.zeros(max(max(cfg.axis_map) + 1, action_dim - 1), np.float32)
        for src, dst in enumerate(cfg.axis_map):
            if 0 <= dst and src < len(d):
                out[dst] = d[src]
        d = out
    d = np.where(np.abs(d) < cfg.deadband, 0.0, d) * cfg.scale
    if cfg.flip:
        for ax in cfg.flip:
            d[ax] = -d[ax]
    d = np.clip(d, -cfg.clip, cfg.clip)
    act = np.zeros(action_dim, np.float32)
    n = min(len(d), action_dim - 1)
    act[:n] = d[:n]
    act[-1] = float(frame.gripper)
    return act


@dataclasses.dataclass
class CollectorConfig:
    hz: float = 10.0
    action_dim: int = 7
    task: str = "teleop"
    start_button: str = "start"
    stop_button: str = "stop"
    success_button: str = "success"
    max_episode_steps: int = 1000
    retarget: RetargetConfig = dataclasses.field(
        default_factory=RetargetConfig)


class TeleopCollector:
    """Fixed-rate collect loop: device -> retarget -> env.step -> episode
    buffers -> LeRobot writer. ``env`` needs reset()->obs and
    step(action)->(obs, reward, done, info) with obs {"states": ...,
    optional "main_images"}; single (non-vector) teleop env."""

    def __init__(self, device: TeleopDevice, env, writer,
                 cfg: CollectorConfig = CollectorConfig(),
                 clock: Callable[[], float] = time.monotonic,
                 sleep: Callable[[float], None] = time.sleep):
        self.device = device
        self.env = env
        self.writer = writer
        self.cfg = cfg
        self.clock = clock
        self.sleep = sleep
        self.episodes_written = 0
        self.frames_dropped = 0     # rate overruns (loop slower than hz)

    def collect_episode(self) -> Dict[str, float]:
        """Wait for start, stream until stop/success/max-steps, write the
        episode (success flag rides in the task string suffix the way the
        reference's collect_monitor tags takes)."""
        cfg = self.cfg
        # arm: wait for the start button
        while True:
            fr = self.device.read()
            if fr.buttons.get(cfg.start_button):
                break
            self.sleep(1.0 / cfg.hz)

        obs = self.env.reset()
        states, actions, images = [], [], []
        success = False
        period = 1.0 / cfg.hz
        next_t = self.clock()
        for _ in range(cfg.max_episode_steps):
            fr = self.device.read()
            if fr.buttons.get(cfg.stop_button):
                break
            if fr.buttons.get(cfg.success_button):
                success = True
                break
            act = retarget(fr, cfg.retarget, cfg.action_dim)
            states.append(np.asarray(obs["states"], np.float32))
            if "main_images" in obs:
                images.append(np.asarray(obs["main_images"]))
            actions.append(act)
            obs, _r, done, _info = self.env.step(act)
            if done:
                success = True
                break
            next_t += period
            lag = next_t - self.clock()
            if lag > 0:
                self.sleep(lag)
            else:
                self.frames_dropped += 1
                next_t = self.clock()

        if not actions:
            return {"frames": 0, "success": False}
        task = cfg.task + ("" if success else " (failed)")
        self.writer.add_episode(
            states=np.stack(states), actions=np.stack(actions), task=task,
            images={"main": np.stack(images)} if images else None,
        )
        self.episodes_written += 1
        return {"frames": len(actions), "success": success}
