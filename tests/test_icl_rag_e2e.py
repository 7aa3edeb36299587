"""End-to-end ICL+RAG pipeline (call stack SURVEY §3.5): build index ->
augment test records with icl_examples -> ICL dataset -> collate ->
MoE generate with mixed image/mask splice."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import ClipVisionConfig, MedplibConfig, MoeConfig, \
    ProjectorConfig
from medplib_tpu.data.dataset import DataConfig, to_model_batch
from medplib_tpu.data.icl_dataset import ICLLazySupervisedDataset, collate_icl
from medplib_tpu.models import clip, medplib
from medplib_tpu.rag import image_rag


class FakeTok:
    bos_token_id = 1
    pad_token_id = 0
    model_max_length = 512

    def __call__(self, text, add_special_tokens=True):
        text = text.replace("</s>", " </s> ")
        ids = ([1] if add_special_tokens else [])
        for w in text.split():
            if w == "</s>":
                ids.append(2)
            elif w.startswith("<SEG>"):
                ids.append(500)
            else:
                ids.append(3 + (hash(w) % 300))
        class R:
            pass
        r = R()
        r.input_ids = ids
        return r


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from PIL import Image
    tmp = tmp_path_factory.mktemp("iclrag")
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.uniform(0, 255, (48, 48, 3)).astype(
            np.uint8)).save(tmp / f"c{i}.png")
        m = np.zeros((48, 48), np.uint8)
        m[8 + i:28, 8:30] = 255
        Image.fromarray(m).save(tmp / f"cm{i}.png")
    cands = [{"image": str(tmp / f"c{i}.png"),
              "conversations": [{"from": "gpt",
                                 "value": f"<SEG> <mask>cm{i}.png</mask>"}]}
             for i in range(4)]
    json.dump(cands, open(tmp / "cands.json", "w"))
    # query record
    Image.fromarray(rng.uniform(0, 255, (48, 48, 3)).astype(
        np.uint8)).save(tmp / "q.png")
    tests = [{"image": str(tmp / "q.png"),
              "conversations": [
                  {"from": "human",
                   "value": "<image>\nSegment the lesion."},
                  {"from": "gpt", "value": "It is <SEG> ."}]}]
    json.dump(tests, open(tmp / "test.json", "w"))
    return str(tmp)


@pytest.mark.slow
def test_rag_augment_feeds_icl_generate(corpus):
    vcfg = ClipVisionConfig.tiny()
    enc = image_rag.ImageRagEncoder(
        clip.init_clip_vision(jax.random.PRNGKey(0), vcfg), vcfg,
        batch_size=4)
    idx_dir = os.path.join(corpus, "index")
    stats = image_rag.build_index(os.path.join(corpus, "cands.json"),
                                  corpus, idx_dir, enc)
    assert stats["count"] == 4

    out_json = os.path.join(corpus, "test_aug.json")
    n = image_rag.augment(os.path.join(corpus, "test.json"), idx_dir,
                          out_json, enc, top_k=2, image_folder=corpus)
    assert n == 1
    recs = json.load(open(out_json))
    assert len(recs[0]["icl_examples"]) == 2
    for ex in recs[0]["icl_examples"]:
        assert os.path.exists(ex["image"])

    # ICL dataset over the augmented file -> batch -> MoE generate
    cfg = dataclasses.replace(
        MedplibConfig.tiny(),
        icl_enable=True,
        moe=MoeConfig(enable=True, num_experts=2, top_k=1,
                      capacity_factor=4.0, eval_capacity_factor=4.0,
                      moe_mode="dense"))
    dcfg = DataConfig(data_path=out_json, image_folder=corpus,
                      sam_image_size=cfg.sam.image_size,
                      clip_image_size=cfg.vision.image_size)
    ds = ICLLazySupervisedDataset(dcfg, FakeTok(),
                                  image_tokens=cfg.vision.num_patches)
    sample = ds[0]
    assert sample["image_clip"].shape[0] == 3  # 2 retrieved examples + query
    assert sample["image_token_types"] == ["image"] * 3

    from medplib_tpu.data.dataset import CollatorConfig
    cc = CollatorConfig(max_seq_len=128,
                        image_tokens=cfg.vision.num_patches,
                        sam_image_size=cfg.sam.image_size,
                        clip_image_size=cfg.vision.image_size)
    arrays, _meta = collate_icl([sample], cc)
    batch = to_model_batch(arrays)
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    res = medplib.generate(params, cfg, batch, max_new_tokens=3)
    assert res.output_ids.shape == (1, 3)
    assert bool(jnp.all(jnp.isfinite(res.pred_masks)))
