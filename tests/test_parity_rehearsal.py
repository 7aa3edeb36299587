"""End-to-end parity REHEARSAL (VERDICT r4 #7): synthesize a random
checkpoint ON DISK in the exact reference merged-HF layout (+ standalone
sam-med2d .pth + HF CLIP dir), then run the same two commands
scripts/parity_eval.sh runs — `utils/export.py from-reference` and
`eval/cli.py` (seg + vqa) — and assert the metrics pipeline produces
finite, schema-complete output. This proves the from-reference -> eval-CLI
chain works first-try the day real weights appear
(merge_lora_weights_and_save_hf_model_moe.py:174-349,
model/medplib/model/builder.py:154-188)."""

import json
import os

import jax
import numpy as np
import pytest

from tests.test_cli import FakeHFTok, fake_tokenizer, tiny_dataset  # noqa: F401

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def reference_layout_artifacts(tmp_path_factory):
    """Random weights written in the three reference artifact formats."""
    import torch

    from medplib_tpu.config import MoeConfig, tiny_cli_config, to_json
    from medplib_tpu.models import medplib
    from medplib_tpu.utils.hf_export import (medplib_to_hf, sam_to_torch,
                                             save_hf_dir)

    tmp = tmp_path_factory.mktemp("ref_layout")
    tok = FakeHFTok()
    # replicate exactly what eval/cli.py builds for --tiny --moe-enable
    moe_cfg = MoeConfig(enable=True, num_experts=2, top_k=1,
                        capacity_factor=1.5, eval_capacity_factor=2.0,
                        moe_mode="dense")
    tok.add_tokens(["<SEG>"])
    seg_idx = tok.convert_tokens_to_ids("<SEG>")
    cfg = tiny_cli_config(moe_cfg, seg_idx, len(tok))

    params = medplib.init_medplib(jax.random.PRNGKey(7), cfg)

    # 1. merged HF dir (the Huangxs/MedPLIB-7b-2e layout, safetensors)
    hf_dir = str(tmp / "medplib-2e")
    save_hf_dir(medplib_to_hf(params, cfg), hf_dir,
                config_json=json.dumps({"model_type": "medplib"}))
    # 2. standalone SAM-Med2D checkpoint (.pth wrapping {"model": sd},
    #    the format build_sam.py:153-191 loads)
    sam_path = str(tmp / "sam-med2d_b.pth")
    sam_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in sam_to_torch(params["sam"], cfg.sam,
                                       prefix="").items()}
    torch.save({"model": sam_sd}, sam_path)
    # 3. HF CLIP vision dir (what --clip-dir points at)
    import transformers
    hf_clip_cfg = transformers.CLIPVisionConfig(
        image_size=cfg.vision.image_size, patch_size=cfg.vision.patch_size,
        hidden_size=cfg.vision.hidden_size,
        intermediate_size=cfg.vision.intermediate_size,
        num_hidden_layers=cfg.vision.num_layers,
        num_attention_heads=cfg.vision.num_heads)
    clip_dir = str(tmp / "clip-vit")
    transformers.CLIPVisionModel(hf_clip_cfg).save_pretrained(clip_dir)

    cfg_json = str(tmp / "medplib_tpu.config.json")
    with open(cfg_json, "w") as f:
        f.write(to_json(cfg))
    return hf_dir, sam_path, clip_dir, cfg_json, str(tmp)


def test_from_reference_then_eval_cli(fake_tokenizer, tiny_dataset,
                                      reference_layout_artifacts, tmp_path):
    from medplib_tpu.eval import cli as eval_cli
    from medplib_tpu.utils import export

    hf_dir, sam_path, clip_dir, cfg_json, _ = reference_layout_artifacts
    data_json, folder = tiny_dataset
    ckpt = str(tmp_path / "ckpt")

    # step 1 of parity_eval.sh: translate the reference artifacts
    import sys
    argv_backup = sys.argv
    sys.argv = ["export", "from-reference", "--hf-dir", hf_dir,
                "--sam-path", sam_path, "--clip-dir", clip_dir,
                "--config", cfg_json, "--out-path", ckpt]
    try:
        export.main()
    finally:
        sys.argv = argv_backup
    assert os.path.exists(ckpt + ".config.json")

    # the translated tree has every tower (no silent random re-init)
    from medplib_tpu.utils.checkpoint import load_params
    tree = load_params(ckpt)
    for key in ("llm", "mm_projector", "text_hidden_fcs", "sam", "clip",
                "region_fea_adapter"):
        assert key in tree, f"missing {key} in translated checkpoint"

    # step 2: seg eval through the CLI against the translated checkpoint
    seg_metrics = str(tmp_path / "seg_metrics.json")
    eval_cli.main([
        "--version", ckpt, "--tokenizer", "fake", "--tiny", "--moe-enable",
        "--dataset-json", data_json, "--image-folder", folder,
        "--mode", "seg", "--batch-size", "1", "--max-new-tokens", "4",
        "--model-max-length", "96", "--precision", "fp32",
        "--answers-file", str(tmp_path / "seg.jsonl"),
        "--metrics-file", seg_metrics,
    ])
    m = json.load(open(seg_metrics))
    assert "per_modality" in m
    assert np.isfinite(float(m["mdice"])) and np.isfinite(float(m["miou"]))
    assert m["n"] == 2  # every tiny_dataset record scored

    # step 3: vqa eval, same checkpoint
    vqa_metrics = str(tmp_path / "vqa_metrics.json")
    eval_cli.main([
        "--version", ckpt, "--tokenizer", "fake", "--tiny", "--moe-enable",
        "--dataset-json", data_json, "--image-folder", folder,
        "--mode", "vqa", "--batch-size", "1", "--max-new-tokens", "4",
        "--model-max-length", "96", "--precision", "fp32",
        "--answers-file", str(tmp_path / "vqa.jsonl"),
        "--metrics-file", vqa_metrics,
    ])
    v = json.load(open(vqa_metrics))
    for key in ("exact_match_acc", "f1", "bleu_1", "bleu_2", "bleu_3",
                "closed_accuracy"):
        assert key in v and np.isfinite(float(v[key])), (key, v)
