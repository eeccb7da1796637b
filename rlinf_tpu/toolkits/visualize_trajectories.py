"""Headless trajectory visualizer for persisted replay buffers.

Reference analog: toolkits/replay_buffer/visualize_headless.py (matplotlib
Agg rendering of stored trajectories for SSH/no-X11 environments). Renders,
per trajectory: a PNG strip of any image-like key (uint8 [T,H,W,C]) and a
reward/done curve; plus a text summary on stdout.

CLI:
    python -m rlinf_tpu.toolkits.visualize_trajectories DIR \
        [--out-dir viz] [--max-trajectories 8] [--stride 4]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import numpy as np

from rlinf_tpu.toolkits.replay_buffer_ops import _list_traj_files


def _is_image(arr: np.ndarray) -> bool:
    return arr.ndim == 4 and arr.dtype == np.uint8 and arr.shape[-1] in (1, 3)


def summarize_trajectory(data: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for k, v in data.items():
        entry = {"shape": list(v.shape), "dtype": str(v.dtype)}
        if np.issubdtype(v.dtype, np.floating):
            entry["mean"] = float(v.mean())
        out[k] = entry
    if "rewards" in data:
        out["return"] = float(np.asarray(data["rewards"], np.float64).sum())
    return out


def render_trajectory(
    data: Dict[str, np.ndarray],
    out_path: str,
    stride: int = 4,
    max_frames: int = 16,
) -> Optional[str]:
    """Write a PNG: image strip (if an image key exists) over reward curve.

    Returns the path, or None when matplotlib is unavailable (summary-only
    mode — the toolkit stays dependency-gated like the reference's cv2/X11
    paths).
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    img_key = next((k for k, v in data.items() if _is_image(v)), None)
    n_rows = (1 if img_key else 0) + 1
    fig, axes = plt.subplots(n_rows, 1, figsize=(10, 3 * n_rows), squeeze=False)
    row = 0
    if img_key:
        frames = data[img_key][::stride][:max_frames]
        strip = np.concatenate(list(frames), axis=1)
        if strip.shape[-1] == 1:
            strip = strip[..., 0]
        axes[row][0].imshow(strip)
        axes[row][0].set_title(f"{img_key} (every {stride}th frame)")
        axes[row][0].axis("off")
        row += 1
    ax = axes[row][0]
    if "rewards" in data:
        ax.plot(np.asarray(data["rewards"], np.float64).reshape(-1), label="reward")
    if "dones" in data:
        ax.plot(np.asarray(data["dones"], np.float64).reshape(-1), label="done")
    ax.legend(loc="best")
    ax.set_xlabel("step")
    fig.tight_layout()
    fig.savefig(out_path, dpi=80)
    plt.close(fig)
    return out_path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dir")
    ap.add_argument("--out-dir", default="viz")
    ap.add_argument("--max-trajectories", type=int, default=8)
    ap.add_argument("--stride", type=int, default=4)
    args = ap.parse_args(argv)

    files = _list_traj_files(args.dir)[: args.max_trajectories]
    os.makedirs(args.out_dir, exist_ok=True)
    for i, p in enumerate(files):
        with np.load(p) as z:
            data = {k: z[k] for k in z.files if k != "__weight__"}
        png = render_trajectory(
            data, os.path.join(args.out_dir, f"traj_{i:04d}.png"), args.stride
        )
        print(json.dumps({"file": p, "png": png, **summarize_trajectory(data)}))


if __name__ == "__main__":
    main()
