"""Reference reasoning-dataset conventions (VERDICT r4 item 10).

Reference: rlinf/data/datasets/reasoning.py (multi-file json/jsonl merge,
prompt/answer keys, chat templating, length filtering, data_size, answer
list coercion), wideseek_r1.py (grading dicts), rstar2.py (tool-schema
templating), __init__.py:30 create_rl_dataset dispatch.
"""

import json

import pytest

from rlinf_tpu.config import DataConfig
from rlinf_tpu.data.datasets import (
    Rstar2Dataset,
    ReasoningDataset,
    WideSeekR1Dataset,
    create_rl_dataset,
)


class StubTokenizer:
    def encode(self, text, add_special_tokens=True):
        toks = text.split()
        return ([0] if add_special_tokens else []) + list(range(len(toks)))

    def apply_chat_template(self, messages, tools=None,
                            add_generation_prompt=True, tokenize=False):
        body = " ".join(m["content"] for m in messages)
        tool_tag = f"[tools:{len(tools)}]" if tools else ""
        return f"<chat>{tool_tag}{body}<gen>"


def _write(tmp_path, name, rows, jsonl=True):
    p = tmp_path / name
    if jsonl:
        p.write_text("\n".join(json.dumps(r) for r in rows))
    else:
        p.write_text(json.dumps(rows))
    return str(p)


def test_multi_file_merge_and_answer_coercion(tmp_path):
    a = _write(tmp_path, "a.jsonl", [
        {"prompt": "p1", "answer": "x"},
        {"prompt": "p2", "answer": ["y", "z"]},
    ])
    b = _write(tmp_path, "b.json", [{"prompt": "p3", "answer": "w"}],
               jsonl=False)
    ds = ReasoningDataset([a, b])
    assert len(ds.examples) == 3
    # string answers coerced to lists (reference __getitem__ convention)
    assert ds.examples[0].answer == ["x"]
    assert ds.examples[1].answer == ["y", "z"]
    assert ds.examples[2].meta["prompt"] == "p3"


def test_data_size_truncation_and_custom_keys(tmp_path):
    p = _write(tmp_path, "d.jsonl", [
        {"q": f"question {i}", "gt": str(i)} for i in range(10)
    ])
    ds = ReasoningDataset(p, prompt_key="q", answer_key="gt", data_size=4)
    assert len(ds.examples) == 4
    assert ds.examples[0].prompt == "question 0"


def test_chat_template_and_length_filter(tmp_path):
    p = _write(tmp_path, "d.jsonl", [
        {"prompt": [{"role": "user", "content": "short one"}],
         "answer": "a"},
        {"prompt": [{"role": "user", "content": " ".join(["w"] * 50)}],
         "answer": "b"},
    ])
    ds = ReasoningDataset(
        p, tokenizer=StubTokenizer(), apply_chat_template=True,
        filter_prompt_by_length=True, max_prompt_length=10,
    )
    assert len(ds.examples) == 1
    assert ds.examples[0].prompt.startswith("<chat>")


def test_bad_rows_are_skipped_not_fatal(tmp_path):
    p = _write(tmp_path, "d.jsonl", [
        {"prompt": "fine", "answer": "a"},
        {"nope": 1},
    ])
    # format errors only surface in the post-process path; batches with
    # failures are dropped with a warning (reference load_post_process)
    ds = ReasoningDataset(
        p, tokenizer=StubTokenizer(), apply_chat_template=True,
        process_batch_size=1,
    )
    assert len(ds.examples) == 1


def test_wideseek_answer_dicts(tmp_path):
    p = _write(tmp_path, "w.jsonl", [
        {"prompt": "p", "answer": "ans", "instance_id": "zh-7",
         "unique_columns": ["c1"],
         "evaluation": json.dumps({"required": ["r1"]})},
    ])
    ds = WideSeekR1Dataset(p, is_markdown=True, enable_zh=True)
    d = ds.examples[0].answer
    assert d["is_markdown"] and d["language"] == "zh"
    assert d["unique_columns"] == ["c1"] and d["required"] == ["r1"]
    # non-markdown mode: list-coerced answer dict
    ds2 = WideSeekR1Dataset(p)
    assert ds2.examples[0].answer["answer"] == ["ans"]


def test_rstar2_tool_schemas_in_template(tmp_path):
    p = _write(tmp_path, "r.jsonl", [
        {"prompt": [{"role": "user", "content": "solve"}], "answer": "1"},
    ])
    ds = Rstar2Dataset(
        p, tokenizer=StubTokenizer(), apply_chat_template=True,
        tool_schemas=[{"name": "python"}],
    )
    assert "[tools:1]" in ds.examples[0].prompt
    # rstar2 encodes without special tokens
    assert ds._encode("a b c") == [0, 1, 2]


def test_create_rl_dataset_dispatch(tmp_path):
    tr = _write(tmp_path, "t.jsonl", [{"prompt": "p", "answer": "a"}])
    va = _write(tmp_path, "v.jsonl", [{"prompt": "q", "answer": "b"}])
    cfg = DataConfig(type="math", train_data_paths=tr, val_data_paths=va)
    train, val = create_rl_dataset(cfg, StubTokenizer())
    assert len(train.examples) == 1 and len(val.examples) == 1
    with pytest.raises(ValueError):
        create_rl_dataset(DataConfig(type="nope"), StubTokenizer())
