"""ICL stage through the DRIVER CLIs (not just the library): train with
--icl-enable + per-epoch validation, --eval_only, and eval with --icl-enable
consuming RAG-style icl_examples (reference train_ds_medplib.py:67-72,
367-374, 494-511; model/eval/vqa_infer.py:62-64, 288)."""

import json
import os

import numpy as np
import pytest

from tests.test_cli import FakeHFTok, fake_tokenizer  # noqa: F401


@pytest.fixture()
def icl_dataset(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.uniform(0, 255, (40, 50, 3)).astype(
            np.uint8)).save(tmp_path / f"im{i}.jpg")
        m = np.zeros((40, 50), np.uint8)
        m[8 + i:20, 10:30] = 255
        Image.fromarray(m).save(tmp_path / f"m{i}.png")
    # the RAG-augmented record form (rag/image_rag.py augment output)
    records = [{
        "image": f"im{i}.jpg",
        "target_mask": f"m{i}.png",
        "icl_examples": [{"image": f"im{(i + 1) % 3}.jpg",
                          "mask": f"m{(i + 1) % 3}.png"}],
    } for i in range(2)]
    path = tmp_path / "icl_train.json"
    json.dump(records, open(path, "w"))
    val = tmp_path / "icl_val.json"
    json.dump(records[:1], open(val, "w"))
    return str(path), str(val), str(tmp_path)


ICL_FLAGS = ["--icl-enable", "--icl-mask-mode", "separate",
             "--icl-mask-encoder", "--mm-token-compress"]


def test_train_cli_icl_validation_and_eval_only(fake_tokenizer, icl_dataset,
                                                tmp_path, capsys):
    from medplib_tpu.train import cli
    data_json, val_json, folder = icl_dataset
    log_dir = str(tmp_path / "runs")
    common = [
        "--version", "random", "--tokenizer", "fake", "--tiny",
        "--dataset-json", data_json, "--image-folder", folder,
        "--val-data-path", val_json, "--val-batch-size", "1",
        "--exp-name", "icl", "--log-base-dir", log_dir,
        "--epochs", "1", "--steps-per-epoch", "2", "--batch-size", "1",
        "--model-max-length", "96", "--warmup-steps", "1",
        "--save-steps", "2", "--log-steps", "1", "--precision", "fp32",
        "--workers", "0",
        # the ICL recipe's sft selection (train_medplib_icl.sh:8-13)
        "--sft-modules",
        "mask_decoder,text_hidden_fcs,mm_token_compressor,mask_encoder",
    ] + ICL_FLAGS
    cli.main(common)
    out = capsys.readouterr().out
    assert "val:" in out and "giou=" in out  # per-epoch validation ran
    run = os.path.join(log_dir, "icl")
    assert os.path.isdir(run)

    # --eval_only restores the checkpoint and validates without training
    cli.main(common + ["--eval-only"])
    out = capsys.readouterr().out
    assert "eval_only @ step" in out and "ciou=" in out


def test_train_cli_icl_no_eval_skips_validation(fake_tokenizer, icl_dataset,
                                                tmp_path, capsys):
    from medplib_tpu.train import cli
    data_json, val_json, folder = icl_dataset
    cli.main([
        "--version", "random", "--tokenizer", "fake", "--tiny",
        "--dataset-json", data_json, "--image-folder", folder,
        "--val-data-path", val_json, "--no-eval",
        "--exp-name", "icl2", "--log-base-dir", str(tmp_path / "runs2"),
        "--epochs", "1", "--steps-per-epoch", "1", "--batch-size", "1",
        "--model-max-length", "96", "--warmup-steps", "1",
        "--save-steps", "5", "--log-steps", "1", "--precision", "fp32",
        "--workers", "0",
    ] + ICL_FLAGS)
    assert "val:" not in capsys.readouterr().out


def test_eval_cli_icl_seg_mode(fake_tokenizer, icl_dataset, tmp_path):
    """The infer_icl_rag.sh path: a test JSON whose records carry
    icl_examples is consumed by the ICL dataset (NOT silently dropped)."""
    from medplib_tpu.eval import cli
    data_json, _, folder = icl_dataset
    answers = str(tmp_path / "ans.jsonl")
    metrics = str(tmp_path / "metrics.json")
    cli.main([
        "--version", "random", "--tokenizer", "fake", "--tiny",
        "--dataset-json", data_json, "--image-folder", folder,
        "--mode", "seg", "--batch-size", "1", "--max-new-tokens", "4",
        "--model-max-length", "96", "--precision", "fp32",
        "--answers-file", answers, "--metrics-file", metrics,
    ] + ICL_FLAGS)
    rows = [json.loads(l) for l in open(answers)]
    assert len(rows) == 2
    assert os.path.exists(metrics)


def test_eval_cli_icl_overlay_mode(fake_tokenizer, icl_dataset, tmp_path):
    from medplib_tpu.eval import cli
    data_json, _, folder = icl_dataset
    answers = str(tmp_path / "ans_ov.jsonl")
    cli.main([
        "--version", "random", "--tokenizer", "fake", "--tiny",
        "--dataset-json", data_json, "--image-folder", folder,
        "--mode", "seg", "--batch-size", "1", "--max-new-tokens", "4",
        "--model-max-length", "96", "--precision", "fp32",
        "--answers-file", answers,
        "--icl-enable", "--icl-mask-mode", "overlay",
    ])
    assert len(open(answers).readlines()) == 2
