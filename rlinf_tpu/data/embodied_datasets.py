"""Embodied SFT dataset family: normalization stats, action-chunk windowing,
image augmentation over lerobot-style episodes.

Reference analog: rlinf/data/datasets/ openpi/behavior/dagger/recap SFT
transforms (~8k LoC total; e.g. openpi_pytorch/behavior/
behavior_sft_dataset.py builds LeRobot frame windows with normalization
stats, delta-action conversion and augmentation;
models/embodiment/openpi/__init__.py:97 loads per-asset norm_stats).
TPU-first shape discipline: every sampled batch has STATIC [B, H, A] chunk
shapes with an explicit pad mask, so the jitted SFT step never recompiles.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Normalization statistics (openpi convention: mean/std AND q01/q99)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class NormStats:
    """Per-dimension stats for one key (state or action vector)."""

    mean: np.ndarray
    std: np.ndarray
    q01: np.ndarray
    q99: np.ndarray

    def to_dict(self) -> Dict[str, List[float]]:
        return {
            "mean": self.mean.tolist(), "std": self.std.tolist(),
            "q01": self.q01.tolist(), "q99": self.q99.tolist(),
        }

    @staticmethod
    def from_dict(d: Dict) -> "NormStats":
        return NormStats(**{
            k: np.asarray(d[k], np.float32)
            for k in ("mean", "std", "q01", "q99")
        })

    # openpi normalization modes: z-score ("normal") and quantile scaling
    # of [q01, q99] onto [-1, 1] ("q99" — bounds action outliers).
    def normalize(self, x: np.ndarray, mode: str = "normal") -> np.ndarray:
        x = np.asarray(x, np.float32)
        if mode == "normal":
            return (x - self.mean) / np.maximum(self.std, 1e-6)
        if mode == "q99":
            span = np.maximum(self.q99 - self.q01, 1e-6)
            return np.clip((x - self.q01) / span, 0.0, 1.0) * 2.0 - 1.0
        raise ValueError(f"unknown normalization mode {mode!r}")

    def unnormalize(self, x: np.ndarray, mode: str = "normal") -> np.ndarray:
        x = np.asarray(x, np.float32)
        if mode == "normal":
            return x * np.maximum(self.std, 1e-6) + self.mean
        if mode == "q99":
            span = np.maximum(self.q99 - self.q01, 1e-6)
            return (x + 1.0) / 2.0 * span + self.q01
        raise ValueError(f"unknown normalization mode {mode!r}")


def compute_norm_stats(arrays: Dict[str, np.ndarray]) -> Dict[str, NormStats]:
    """{key: [N, D]} -> per-key NormStats (frame-level, like the reference's
    compute-norm-stats pass over the dataset)."""
    out = {}
    for k, v in arrays.items():
        v = np.asarray(v, np.float32).reshape(len(v), -1)
        out[k] = NormStats(
            mean=v.mean(0), std=v.std(0),
            q01=np.quantile(v, 0.01, axis=0).astype(np.float32),
            q99=np.quantile(v, 0.99, axis=0).astype(np.float32),
        )
    return out


def save_norm_stats(stats: Dict[str, NormStats], path: str):
    with open(path, "w") as f:
        json.dump({k: s.to_dict() for k, s in stats.items()}, f)


def load_norm_stats(path: str) -> Dict[str, NormStats]:
    with open(path) as f:
        raw = json.load(f)
    return {k: NormStats.from_dict(d) for k, d in raw.items()}


# ---------------------------------------------------------------------------
# Image augmentation (host-side numpy; the reference uses torchvision-style
# random resized crop + color jitter in its SFT transforms)
# ---------------------------------------------------------------------------


def augment_images(
    rng: np.random.Generator,
    images: np.ndarray,                 # [B, H, W, C] uint8 or float
    *,
    crop_scale: float = 0.9,
    brightness: float = 0.1,
    contrast: float = 0.1,
) -> np.ndarray:
    """Random crop (resized back by strided nearest sampling) + brightness /
    contrast jitter. Output float32 in the input's value range, same shape
    (static shapes: the crop is re-sampled to HxW)."""
    imgs = np.asarray(images, np.float32)
    B, H, W, C = imgs.shape
    out = np.empty_like(imgs)
    ch = max(int(H * crop_scale), 1)
    cw = max(int(W * crop_scale), 1)
    ys = rng.integers(0, H - ch + 1, size=B)
    xs = rng.integers(0, W - cw + 1, size=B)
    row_idx = np.clip(
        (np.arange(H)[None, :] * ch / H).astype(int), 0, ch - 1)
    col_idx = np.clip(
        (np.arange(W)[None, :] * cw / W).astype(int), 0, cw - 1)
    for b in range(B):
        crop = imgs[b, ys[b]:ys[b] + ch, xs[b]:xs[b] + cw]
        out[b] = crop[row_idx[0]][:, col_idx[0]]
    scale = 1.0 + rng.uniform(-contrast, contrast, size=(B, 1, 1, 1))
    shift = rng.uniform(-brightness, brightness, size=(B, 1, 1, 1))
    vmax = 255.0 if images.dtype == np.uint8 else 1.0
    mean = out.mean(axis=(1, 2, 3), keepdims=True)
    out = (out - mean) * scale + mean + shift * vmax
    return np.clip(out, 0.0, vmax).astype(np.float32)


# ---------------------------------------------------------------------------
# Action-chunk windowing over episodes
# ---------------------------------------------------------------------------


class ActionChunkDataset:
    """Frame dataset yielding openpi-style action chunks.

    Episodes come from CollectEpisodeWrapper npz files (obs/<k> [T, ...],
    actions [T, A]) or in-memory dicts. Each sampled frame t yields:

      obs        {key: [B, ...]}    (images float32-augmented when enabled)
      actions    [B, horizon, A]    actions[t : t+horizon], zero-padded
      action_pad_mask [B, horizon]  True on real (in-episode) steps
      -- flattened to [B, horizon*A] when ``flatten_chunks`` (MLP heads)

    Normalization: state keys z-scored, actions quantile-scaled to [-1, 1]
    (the openpi convention); stats computed from the data unless given.
    Delta actions: ``delta_action_dims`` indices are converted to
    action[t+k] - state[t] (reference delta-action transform for joint
    positions).
    """

    def __init__(
        self,
        episodes: Optional[List[Dict[str, np.ndarray]]] = None,
        *,
        directory: Optional[str] = None,
        horizon: int = 4,
        augment: bool = False,
        stats: Optional[Dict[str, NormStats]] = None,
        state_key: str = "obs/states",
        norm_mode_actions: str = "q99",
        delta_action_dims: Optional[Sequence[int]] = None,
        flatten_chunks: bool = False,
        max_episodes: Optional[int] = None,
    ):
        if episodes is None:
            assert directory is not None, "need episodes or directory"
            episodes = []
            files = sorted(
                f for f in os.listdir(directory) if f.endswith(".npz"))
            if max_episodes:
                files = files[:max_episodes]
            for name in files:
                with np.load(os.path.join(directory, name)) as z:
                    episodes.append({k: z[k] for k in z.files})
        self.episodes = episodes
        self.horizon = horizon
        self.augment = augment
        self.state_key = state_key
        self.norm_mode_actions = norm_mode_actions
        self.delta_dims = (
            np.asarray(delta_action_dims, int)
            if delta_action_dims is not None else None
        )
        self.flatten_chunks = flatten_chunks

        # flat frame index: (episode, t)
        self._frames = [
            (e, t)
            for e, ep in enumerate(episodes)
            for t in range(len(ep["actions"]))
        ]
        if stats is None:
            flat: Dict[str, list] = {}
            for ep in episodes:
                flat.setdefault("actions", []).append(
                    np.asarray(ep["actions"], np.float32))
                if state_key in ep:
                    flat.setdefault(state_key, []).append(
                        np.asarray(ep[state_key], np.float32))
            stats = compute_norm_stats(
                {k: np.concatenate(v, 0) for k, v in flat.items()}
            )
        self.stats = stats

    @property
    def num_frames(self) -> int:
        return len(self._frames)

    def __len__(self) -> int:
        return self.num_frames

    def _chunk(self, ep: Dict[str, np.ndarray], t: int):
        """(chunk [H, A], pad_mask [H]) with zero-pad past episode end."""
        acts = np.asarray(ep["actions"], np.float32)
        T, A = acts.shape
        H = self.horizon
        chunk = np.zeros((H, A), np.float32)
        n = min(H, T - t)
        chunk[:n] = acts[t:t + n]
        if self.delta_dims is not None and self.state_key in ep:
            state_t = np.asarray(ep[self.state_key][t], np.float32).reshape(-1)
            chunk[:n, self.delta_dims] -= state_t[self.delta_dims][None, :]
        mask = np.zeros(H, bool)
        mask[:n] = True
        return chunk, mask

    def sample_frames(
        self, batch_size: int, rng: np.random.Generator
    ) -> Dict[str, np.ndarray]:
        idx = rng.integers(0, self.num_frames, size=batch_size)
        obs_cols: Dict[str, list] = {}
        chunks, masks = [], []
        for i in idx:
            e, t = self._frames[i]
            ep = self.episodes[e]
            for k in ep:
                if k.startswith("obs/"):
                    obs_cols.setdefault(k, []).append(np.asarray(ep[k][t]))
            c, m = self._chunk(ep, t)
            chunks.append(c)
            masks.append(m)
        out: Dict[str, np.ndarray] = {}
        for k, v in obs_cols.items():
            arr = np.stack(v)
            if k == self.state_key and k in self.stats:
                arr = self.stats[k].normalize(arr, "normal")
            elif arr.ndim == 4 and self.augment:  # [B, H, W, C] images
                arr = augment_images(rng, arr)
            out[k] = arr
        actions = np.stack(chunks)  # [B, H, A]
        actions = self.stats["actions"].normalize(
            actions, self.norm_mode_actions)
        pad = np.stack(masks)
        actions = actions * pad[..., None]  # zero the padded tail again
        if self.flatten_chunks:
            actions = actions.reshape(batch_size, -1)
        out["actions"] = actions
        out["action_pad_mask"] = pad
        return out

    def unnormalize_actions(self, actions: np.ndarray) -> np.ndarray:
        """Model output -> env action units (rollout-side inverse)."""
        return self.stats["actions"].unnormalize(
            actions, self.norm_mode_actions)


# ---------------------------------------------------------------------------
# STEAM pair dataset (VERDICT r4 item 10 family tail): labeled temporal
# frame pairs for the stride critic (models/embodiment/value_critic.SteamCritic).
# Reference: rlinf/data/datasets/steam/pair_dataset.py (binary fixed-stride
# mode with end-of-episode clamp; multi-bin mode with per-anchor uniform
# stride resampling; optional length-scaled binning so a fixed frame jump
# maps to more progress in shorter episodes).
# ---------------------------------------------------------------------------


def signed_stride_to_bin(stride: float, k: int, num_bins: int) -> int:
    """Signed stride in [-K, K] \\ {0} -> bin in [0, num_bins). First half
    regressive (far -> near), second half progressive (near -> far);
    |stride| > K saturates into the extreme bins."""
    if num_bins == 2:
        return int(stride > 0)
    half = num_bins // 2
    mag = min(max(abs(float(stride)), 1.0), float(k))
    sub = int(np.ceil(mag * half / k)) - 1
    return half + sub if stride > 0 else half - 1 - sub


class SteamPairDataset:
    """Frame pairs (image_t, image_tk, label) from per-episode image arrays.

    ``episodes``: list of dicts with ``images`` [T, H, W, C] (uint8 or
    float) and optional ``prompt``. Anchors enumerate every (episode, t)
    with t <= T-2; each anchor yields one positive (forward) and one
    negative (backward) pair, interleaved — the reference's
    positive/negative index decoding.
    """

    def __init__(self, episodes: List[Dict[str, np.ndarray]], *,
                 k: int = 8, num_bins: int = 2,
                 length_scale: bool = False, seed: int = 0):
        if num_bins < 2 or num_bins % 2:
            raise ValueError(f"num_bins must be >= 2 and even: {num_bins}")
        self.episodes = episodes
        self.k = k
        self.num_bins = num_bins
        self.length_scale = length_scale
        self._rng = np.random.default_rng(seed)
        self._anchors = [
            (e, t)
            for e, ep in enumerate(episodes)
            for t in range(len(ep["images"]) - 1)
        ]
        self._len_ref = max(
            (len(ep["images"]) for ep in episodes), default=0)

    def __len__(self) -> int:
        return 2 * len(self._anchors)

    def __getitem__(self, idx: int) -> Dict:
        pos = idx // 2
        is_positive = idx % 2 == 0
        e, t = self._anchors[pos]
        ep = self.episodes[e]
        T = len(ep["images"])
        if self.num_bins == 2:
            # binary: fixed stride k, clamped at the episode end
            tk = min(t + self.k, T - 1)
            a, b = (t, tk) if is_positive else (tk, t)
            label = int(is_positive)
            stride = self.k if is_positive else -self.k
        else:
            max_stride = min(self.k, T - 1 - t)
            i = int(self._rng.integers(1, max_stride + 1))
            a, b = (t, t + i) if is_positive else (t + i, t)
            stride = i if is_positive else -i
            s = float(stride)
            if self.length_scale and self._len_ref:
                s *= max(1.0, self._len_ref / float(T))
            label = signed_stride_to_bin(s, self.k, self.num_bins)
        return {
            "image_t": np.asarray(ep["images"][a]),
            "image_tk": np.asarray(ep["images"][b]),
            "label": label,
            "stride": stride,
            "episode": e,
            "prompt": ep.get("prompt", ""),
        }

    def sample_batch(self, batch_size: int) -> Dict[str, np.ndarray]:
        idx = self._rng.integers(0, len(self), batch_size)
        items = [self[int(i)] for i in idx]
        return {
            "image_t": np.stack([it["image_t"] for it in items]),
            "image_tk": np.stack([it["image_tk"] for it in items]),
            "labels": np.asarray([it["label"] for it in items], np.int32),
            "strides": np.asarray([it["stride"] for it in items], np.int32),
        }
