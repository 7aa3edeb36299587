"""ICL dataset + end-to-end ICL forward through the tiny composite model."""

import dataclasses
import json

import jax
import numpy as np
import pytest

from medplib_tpu.config import MedplibConfig, ProjectorConfig
from medplib_tpu.data.dataset import CollatorConfig, DataConfig, to_model_batch
from medplib_tpu.data.icl_dataset import ICLLazySupervisedDataset, collate_icl
from medplib_tpu.models import medplib


class FakeTok:
    bos_token_id = 1
    pad_token_id = 0
    model_max_length = 512

    def __call__(self, text, add_special_tokens=True):
        ids = ([1] if add_special_tokens else [])
        for w in text.split():
            if w == "<SEG>":
                ids.append(500)
            else:
                ids.append(3 + (hash(w) % 300))
        class R:
            pass
        r = R()
        r.input_ids = ids
        return r


@pytest.fixture(scope="module")
def icl_data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("icl")
    from PIL import Image
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.uniform(0, 255, (60, 80, 3)).astype(
            np.uint8)).save(tmp / f"img{i}.png")
        m = np.zeros((60, 80), np.uint8)
        m[10 + i:30, 20:50] = 255
        Image.fromarray(m).save(tmp / f"mask{i}.png")
    records = [
        # icl_examples form
        {"image": str(tmp / "img2.png"),
         "target_mask": "mask2.png",
         "icl_examples": [{"image": str(tmp / "img0.png"),
                           "mask": "mask0.png"}]},
        # imageN/maskN form, no conversations
        {"image1": str(tmp / "img0.png"), "mask1": "mask0.png",
         "image2": str(tmp / "img1.png"), "mask2": "mask1.png",
         "image3": str(tmp / "img2.png"), "mask3": "mask2.png"},
    ]
    data_path = tmp / "icl.json"
    json.dump(records, open(data_path, "w"))
    return str(data_path), str(tmp)


def _dataset(icl_data, **kw):
    data_path, folder = icl_data
    cfg = DataConfig(data_path=data_path, image_folder=folder,
                     sam_image_size=64, clip_image_size=56)
    return ICLLazySupervisedDataset(cfg, FakeTok(), image_tokens=16,
                                    mask_tokens=4, **kw)


def test_overlay_mode_slots(icl_data):
    ds = _dataset(icl_data, mask_mode="overlay")
    s = ds[0]
    assert s["image_token_types"] == ["image", "image"]  # 1 example + query
    assert s["image_token_lengths"] == [16, 16]
    assert s["image_clip"].shape[0] == 2
    assert len(s["gt_masks"]) == 1
    # imageN/maskN record: 2 examples + query
    s2 = ds[1]
    assert s2["image_token_types"] == ["image"] * 3
    # sentinel count in input_ids matches slots
    assert int((s2["input_ids"] == -200).sum()) == 3


def test_separate_mask_encoder_mode(icl_data):
    ds = _dataset(icl_data, mask_mode="separate", use_mask_encoder=True)
    s = ds[0]
    assert s["image_token_types"] == ["image", "mask", "image"]
    assert s["image_token_lengths"] == [16, 4, 16]
    assert s["mask_images"][1].max() == 1.0  # real mask in the mask slot
    assert int((s["input_ids"] == -200).sum()) == 3


@pytest.mark.slow
def test_icl_end_to_end_forward(icl_data):
    ds = _dataset(icl_data, mask_mode="separate", use_mask_encoder=True)
    samples = [ds[0], ds[1]]
    cc = CollatorConfig(max_seq_len=96, max_segs=1, image_tokens=16,
                        sam_image_size=64, clip_image_size=56)
    arrays, meta = collate_icl(samples, cc, max_slots=7, mask_tokens=4)
    assert arrays["images_clip"].shape == (2, 7, 56, 56, 3)
    assert arrays["image_is_mask"][0].tolist() == [0, 1, 0, 0, 0, 0, 0]

    cfg0 = MedplibConfig.tiny()
    cfg = dataclasses.replace(
        cfg0, icl_enable=True,
        projector=dataclasses.replace(cfg0.projector, mask_encoder=True,
                                      mask_encoder_tokens=4))
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    batch = to_model_batch(arrays)
    out = medplib.model_forward(params, cfg, batch, train=True)
    assert np.isfinite(float(out["loss"]))
    res = medplib.generate(params, cfg, batch, max_new_tokens=3)
    assert res.pred_masks.shape == (2, 1, 64, 64)
