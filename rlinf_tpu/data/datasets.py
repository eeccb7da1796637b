"""Prompt datasets for reasoning RL + a checkpointable batch iterator.

Reference analog: rlinf/data/datasets/reasoning.py (math jsonl) and the
StatefulDataLoader state save/restore the runner checkpoints
(reference runners/reasoning_runner.py:376-380).
"""

from __future__ import annotations

import dataclasses
import json
import random
from typing import Callable, Dict, Iterator, List, Optional, Sequence


@dataclasses.dataclass
class PromptExample:
    prompt: str
    answer: str
    meta: Optional[dict] = None


class PromptDataset:
    """jsonl with {prompt|question|problem, answer|solution} fields."""

    PROMPT_KEYS = ("prompt", "question", "problem", "query")
    ANSWER_KEYS = ("answer", "solution", "ground_truth", "label")

    def __init__(self, examples: Sequence[PromptExample]):
        self.examples = list(examples)

    @staticmethod
    def from_jsonl(path: str, max_examples: Optional[int] = None) -> "PromptDataset":
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                prompt = next(
                    (row[k] for k in PromptDataset.PROMPT_KEYS if k in row), None
                )
                answer = next(
                    (row[k] for k in PromptDataset.ANSWER_KEYS if k in row), None
                )
                if prompt is None:
                    continue
                out.append(PromptExample(str(prompt), str(answer), meta=row))
                if max_examples and len(out) >= max_examples:
                    break
        return PromptDataset(out)

    def __len__(self) -> int:
        return len(self.examples)

    def __getitem__(self, i: int) -> PromptExample:
        return self.examples[i]


@dataclasses.dataclass
class VQAExample:
    """One VQA row: image (path or array), question, answer(s)."""

    image: object                 # str path or np.ndarray HWC
    question: str
    answers: List[str]
    meta: Optional[dict] = None


class VQADataset:
    """VQA jsonl: {image|image_path, question, answer|answers} (reference
    rlinf/data/datasets VQA/VLM loaders). ``load_image`` lazily decodes path
    rows to float32 HWC arrays; answers list feeds the soft-accuracy reward
    (algorithms/rewards vqa)."""

    def __init__(self, examples: Sequence[VQAExample]):
        self.examples = list(examples)

    @staticmethod
    def from_jsonl(path: str, max_examples: Optional[int] = None) -> "VQADataset":
        out = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                image = row.get("image", row.get("image_path"))
                question = row.get("question", row.get("prompt"))
                answers = row.get("answers")
                if answers is None:
                    a = row.get("answer", row.get("label"))
                    answers = [str(a)] if a is not None else []
                if image is None or question is None:
                    continue
                out.append(VQAExample(image, str(question),
                                      [str(a) for a in answers], meta=row))
                if max_examples and len(out) >= max_examples:
                    break
        return VQADataset(out)

    @staticmethod
    def load_image(ex: VQAExample):
        import numpy as np

        if isinstance(ex.image, str):
            from PIL import Image

            with Image.open(ex.image) as im:
                return np.asarray(im.convert("RGB"), np.float32) / 255.0
        return np.asarray(ex.image, np.float32)

    def __len__(self) -> int:
        return len(self.examples)

    def __getitem__(self, i: int) -> VQAExample:
        return self.examples[i]


class EpisodeDataset:
    """Frame-level dataset over collected episode files (the lerobot-episode
    analog, reference data/lerobot_writer.py + embodied_buffer_dataset.py).

    Reads the npz episodes written by CollectEpisodeWrapper (obs/<k> [T,...],
    actions [T,A], rewards [T]) and serves shuffled frame batches for
    SFT/DAgger/BC — obs keys flattened to "obs/<k>" like ReplayBuffer
    transitions, so the same BC train steps consume either source.
    """

    def __init__(self, directory: str, *, max_episodes: Optional[int] = None):
        import os

        import numpy as np

        self.directory = directory
        files = sorted(
            f for f in os.listdir(directory) if f.endswith(".npz"))
        if max_episodes:
            files = files[:max_episodes]
        cols: Dict[str, list] = {}
        self.episode_lengths: List[int] = []
        for name in files:
            with np.load(os.path.join(directory, name)) as z:
                self.episode_lengths.append(int(z["actions"].shape[0]))
                for k in z.files:
                    cols.setdefault(k, []).append(z[k])
        self.data: Dict[str, "np.ndarray"] = {
            k: np.concatenate(v, axis=0) for k, v in cols.items()
        }
        self.num_frames = sum(self.episode_lengths)
        self.num_episodes = len(self.episode_lengths)

    def sample_frames(self, batch_size: int, rng) -> Dict[str, "np.ndarray"]:
        idx = rng.integers(0, self.num_frames, size=batch_size)
        return {k: v[idx] for k, v in self.data.items()}

    def __len__(self) -> int:
        return self.num_frames


class StatefulBatchIterator:
    """Infinite shuffled batch iterator with exact-resume state.

    ``state_dict``/``load_state_dict`` mirror torchdata's StatefulDataLoader
    used by the reference runner for dataloader-state checkpointing.
    """

    def __init__(self, dataset: PromptDataset, batch_size: int, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.epoch = 0
        self.index = 0
        self._order: List[int] = []
        self._reshuffle()

    def _reshuffle(self):
        rng = random.Random(f"{self.seed}-{self.epoch}")
        self._order = list(range(len(self.dataset)))
        rng.shuffle(self._order)

    def next_batch(self) -> List[PromptExample]:
        out = []
        while len(out) < self.batch_size:
            if self.index >= len(self._order):
                self.epoch += 1
                self.index = 0
                self._reshuffle()
            out.append(self.dataset[self._order[self.index]])
            self.index += 1
        return out

    def state_dict(self) -> Dict:
        return {"epoch": self.epoch, "index": self.index, "seed": self.seed}

    def load_state_dict(self, state: Dict):
        self.seed = state["seed"]
        self.epoch = state["epoch"]
        self.index = state["index"]
        self._reshuffle()
