"""Orbax checkpointing with auto-resume + dataloader state.

Reference analog: runner-level ``resume_dir: auto`` scanning
``checkpoints/global_step_*`` (reference runners/reasoning_runner.py:291-318)
and saving actor state + StatefulDataLoader state (:376-380). Megatron/FSDP
dist-checkpoint machinery collapses to orbax: the sharded train-state pytree
saves/restores with its shardings.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, root_dir: str, max_to_keep: int = 3):
        self.root_dir = os.path.abspath(root_dir)
        os.makedirs(self.root_dir, exist_ok=True)
        self.max_to_keep = max_to_keep

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.root_dir, f"global_step_{step}")

    def latest_step(self) -> Optional[int]:
        steps = []
        if not os.path.isdir(self.root_dir):
            return None
        for name in os.listdir(self.root_dir):
            m = re.fullmatch(r"global_step_(\d+)", name)
            if m and os.path.exists(os.path.join(self.root_dir, name, "_DONE")):
                steps.append(int(m.group(1)))
        return max(steps) if steps else None

    def save(self, step: int, state: Any, extra: Optional[Dict] = None):
        """Save train-state pytree + json-serializable extra state
        (dataloader position, rng seeds, config echo)."""
        path = self._step_dir(step)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, "state"), state)
        if extra is not None:
            with open(os.path.join(path, "extra.json"), "w") as f:
                json.dump(extra, f)
        with open(os.path.join(path, "_DONE"), "w") as f:
            f.write("ok")
        self._gc()

    def restore(self, state_template: Any, step: Optional[int] = None
                ) -> Tuple[Any, Optional[Dict], Optional[int]]:
        """Restore latest (or given) step onto the template's shardings."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None, None, None
        path = self._step_dir(step)
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(
                os.path.join(path, "state"),
                jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_template),
            )
        extra = None
        extra_path = os.path.join(path, "extra.json")
        if os.path.exists(extra_path):
            with open(extra_path) as f:
                extra = json.load(f)
        return state, extra, step

    def _gc(self):
        steps = sorted(
            int(m.group(1))
            for name in os.listdir(self.root_dir)
            if (m := re.fullmatch(r"global_step_(\d+)", name))
        )
        for s in steps[: -self.max_to_keep]:
            import shutil

            shutil.rmtree(self._step_dir(s), ignore_errors=True)
