"""Realworld hardware preflight checks.

Reference analog: toolkits/realworld_check/ (test_franka_controller.py,
test_franka_camera.py, collect_monitor.py, ...) — per-device smoke scripts
run before a realworld RL session. Re-designed as one structured checker
over rlinf_tpu's driver registry (envs/realworld.py): connect, state read,
small action round-trip, home reset, control-rate measurement, and camera
frame grab, each reported as pass/fail with detail.

CLI:
    python -m rlinf_tpu.toolkits.realworld_check \
        [--robot-type simulated] [--robot-ip IP] [--hz 10] [--steps 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from typing import Callable, Dict, List, Optional

import numpy as np

from rlinf_tpu.envs.realworld import (
    CameraDriver,
    RobotAutoConfig,
    RobotConfig,
    get_robot_driver,
)


@dataclasses.dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str = ""

    def as_dict(self) -> Dict:
        return dataclasses.asdict(self)


def _run(name: str, fn: Callable[[], str]) -> CheckResult:
    try:
        return CheckResult(name, True, fn())
    except Exception as e:
        return CheckResult(name, False, f"{type(e).__name__}: {e}")


def preflight(
    cfg: RobotConfig,
    camera: Optional[CameraDriver] = None,
    n_rate_steps: int = 20,
) -> List[CheckResult]:
    """Run the full preflight sequence against one robot config.

    Safe by construction: the action round-trip sends a zero action (no
    motion on real hardware), mirroring the reference's controller test
    scripts which jog with zero/home targets first.
    """
    results: List[CheckResult] = []
    driver = None

    def _connect() -> str:
        nonlocal driver
        driver = get_robot_driver(cfg)
        driver.connect()
        return f"{cfg.robot_type} @ {cfg.robot_ip or 'local'}"

    results.append(_run("connect", _connect))
    if not results[-1].ok:
        return results

    def _state() -> str:
        s = driver.get_state()
        assert s.shape == (cfg.state_dim,), f"state shape {s.shape}"
        assert np.all(np.isfinite(s)), "non-finite state"
        return f"state_dim={s.shape[0]}"

    results.append(_run("state_read", _state))

    def _zero_action() -> str:
        before = driver.get_state()
        driver.send_action(np.zeros(cfg.action_dim, np.float32))
        after = driver.get_state()
        drift = float(np.abs(after - before).max())
        assert drift < 1e-3, f"zero action moved robot by {drift}"
        return f"drift={drift:.2e}"

    results.append(_run("zero_action_roundtrip", _zero_action))

    def _home() -> str:
        driver.reset_to_home()
        return "ok"

    results.append(_run("reset_to_home", _home))

    def _rate() -> str:
        period = 1.0 / cfg.control_hz
        t0 = time.perf_counter()
        for _ in range(n_rate_steps):
            step_start = time.perf_counter()
            driver.send_action(np.zeros(cfg.action_dim, np.float32))
            driver.get_state()
            sleep = period - (time.perf_counter() - step_start)
            if sleep > 0:
                time.sleep(sleep)
        achieved = n_rate_steps / (time.perf_counter() - t0)
        assert achieved > 0.8 * cfg.control_hz, (
            f"control rate {achieved:.1f}Hz < 80% of target {cfg.control_hz}Hz"
        )
        return f"{achieved:.1f}Hz (target {cfg.control_hz}Hz)"

    results.append(_run("control_rate", _rate))

    if camera is not None:
        def _cam() -> str:
            frame = camera.read()
            assert frame.ndim == 3 and frame.shape[-1] == 3, frame.shape
            assert frame.dtype == np.uint8, frame.dtype
            return f"frame={frame.shape[0]}x{frame.shape[1]}"

        results.append(_run("camera_frame", _cam))

    results.append(_run("disconnect", lambda: (driver.disconnect(), "ok")[1]))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--robot-type", default="simulated")
    ap.add_argument("--robot-ip", default=None)
    ap.add_argument("--hz", type=float, default=10.0)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args(argv)

    cfg = RobotConfig(
        robot_type=args.robot_type, robot_ip=args.robot_ip, control_hz=args.hz
    )
    [cfg] = RobotAutoConfig.resolve([cfg])
    results = preflight(cfg, n_rate_steps=args.steps)
    for r in results:
        print(json.dumps(r.as_dict()))
    n_fail = sum(not r.ok for r in results)
    print(json.dumps({"passed": len(results) - n_fail, "failed": n_fail}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
