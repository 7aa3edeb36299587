"""End-to-end Evaluator: synthetic dataset -> chunked generate -> jsonl +
metrics (covers eval/infer.py on the CPU mesh)."""

import json
import os

import jax
import numpy as np
import pytest

from medplib_tpu.config import MedplibConfig
from medplib_tpu.data.dataset import (CollatorConfig, DataConfig,
                                      LazySupervisedDataset)
from medplib_tpu.eval.infer import EvalConfig, Evaluator, get_chunk, \
    merge_chunk_outputs, truncate_prompt_at_colon
from medplib_tpu.models import medplib


class FakeTok:
    bos_token_id = 1
    pad_token_id = 0
    eos_token_id = 2
    model_max_length = 512

    def __call__(self, text, add_special_tokens=True):
        ids = ([1] if add_special_tokens else [])
        for w in text.split():
            ids.append(400 if w == ":" else 3 + (hash(w) % 300))
        class R:
            pass
        r = R()
        r.input_ids = ids
        return r

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(f"t{t}" for t in ids)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("evalds")
    from PIL import Image
    rng = np.random.default_rng(0)
    records = []
    for i in range(5):
        Image.fromarray(rng.uniform(0, 255, (50, 70, 3)).astype(
            np.uint8)).save(tmp / f"ct_img{i}.png")
        m = np.zeros((50, 70), np.uint8)
        m[10:30, 20:40] = 255
        Image.fromarray(m).save(tmp / f"m{i}.png")
        records.append({
            "image": str(tmp / f"ct_img{i}.png"),
            "answer_type": "open",
            "conversations": [
                {"from": "human", "value": "<image>\nsegment the organ :"},
                {"from": "gpt",
                 "value": f"it is <SEG> <mask>m{i}.png</mask>"}]})
    json.dump(records, open(tmp / "test.json", "w"))
    cfg = DataConfig(data_path=str(tmp / "test.json"),
                     image_folder=str(tmp), sam_image_size=64,
                     clip_image_size=56, augment_regions=False)
    return LazySupervisedDataset(cfg, FakeTok(), train=False)


def test_get_chunk_partition():
    items = list(range(10))
    chunks = [get_chunk(items, 3, i) for i in range(3)]
    assert sum(chunks, []) == items
    assert get_chunk(items, 20, 19) == []


def test_truncate_at_colon():
    ids = np.array([1, 5, 400, 7, 8])
    out = truncate_prompt_at_colon(ids, colon_id=400)
    assert out.tolist() == [1, 5, 400]
    assert truncate_prompt_at_colon(np.array([1, 2]), 400).tolist() == [1, 2]


def test_evaluator_seg_mode(dataset, tmp_path):
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    cc = CollatorConfig(max_seq_len=48, image_tokens=cfg.vision.num_patches,
                        sam_image_size=64, clip_image_size=56)
    out1 = str(tmp_path / "c0.jsonl")
    out2 = str(tmp_path / "c1.jsonl")
    m0 = Evaluator(cfg, params, FakeTok(),
                   EvalConfig(num_chunks=2, chunk_idx=0, batch_size=2,
                              max_new_tokens=4, colon_token_id=400,
                              output_path=out1), cc).run(dataset, "seg")
    m1 = Evaluator(cfg, params, FakeTok(),
                   EvalConfig(num_chunks=2, chunk_idx=1, batch_size=2,
                              max_new_tokens=4, colon_token_id=400,
                              output_path=out2), cc).run(dataset, "seg")
    assert m0["n"] + m1["n"] == 5
    assert "ct" in m0["per_modality"]
    assert 0.0 <= m0["mdice"] <= 100.0

    merged = str(tmp_path / "all.jsonl")
    merge_chunk_outputs([out1, out2], merged)
    lines = [json.loads(l) for l in open(merged)]
    assert len(lines) == 5
    assert {l["question_id"] for l in lines} == set(range(5))
    assert all("iou" in l for l in lines)


def test_evaluator_vqa_mode(dataset, tmp_path):
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(1), cfg)
    cc = CollatorConfig(max_seq_len=48, image_tokens=cfg.vision.num_patches,
                        sam_image_size=64, clip_image_size=56)
    metrics = Evaluator(
        cfg, params, FakeTok(),
        EvalConfig(batch_size=2, max_new_tokens=4, colon_token_id=400,
                   output_path=str(tmp_path / "vqa.jsonl")), cc
    ).run(dataset, "vqa")
    assert metrics["num_open"] == 5
    assert "bleu_1" in metrics
