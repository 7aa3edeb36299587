"""Hybrid multi-task data stack (data/hybrid.py) on synthetic on-disk data."""

import json
import os

import numpy as np
import pytest

from medplib_tpu.data.dataset import CollatorConfig, collate, to_model_batch
from medplib_tpu.data.hybrid import (HybridConfig, HybridDataset,
                                     ReasonSegSource, decode_rle,
                                     polygons_to_mask, segmentation_to_mask)


class FakeTok:
    bos_token_id = 1
    pad_token_id = 0
    model_max_length = 512

    def __call__(self, text, add_special_tokens=True):
        # keep </s> a standalone token so preprocess_v1's per-round length
        # bookkeeping stays consistent (1 bos per round offsets 1 sep2)
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
def hybrid_root(tmp_path_factory):
    from PIL import Image
    base = tmp_path_factory.mktemp("hybrid")
    rng = np.random.default_rng(0)

    def save_img(path, h=48, w=64):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(
            rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)).save(path)

    # sem_seg: 2 images + class-id label maps + classes.json
    root = base / "sem_seg" / "toy"
    for i in range(2):
        save_img(str(root / "images" / f"im{i}.jpg"))
        lab = np.zeros((48, 64), np.uint8)
        lab[8:24, 8:32] = 1
        lab[30:44, 40:60] = 2
        os.makedirs(root / "labels", exist_ok=True)
        Image.fromarray(lab).save(root / "labels" / f"im{i}.png")
    json.dump(["background", "liver", "kidney"],
              open(root / "classes.json", "w"))

    # refer_seg: one image, polygon + RLE annotations
    save_img(str(base / "imgs" / "r0.jpg"))
    refer = {
        "images": [{"file_name": "imgs/r0.jpg", "id": 7,
                    "height": 48, "width": 64}],
        "annotations": {
            "11": {"segmentation": [[8, 8, 40, 8, 40, 30, 8, 30]]},
            "12": {"segmentation": {
                "size": [48, 64],
                # column-major runs: 100 zeros, 200 ones, rest zeros
                "counts": [100, 200, 48 * 64 - 300]}},
        },
        "refs": [
            {"image_id": 7, "ann_id": 11,
             "sentences": [{"sent": "the large lesion"}]},
            {"image_id": 7, "ann_id": 12,
             "sentences": [{"sent": "tissue on the left"}]},
        ],
    }
    os.makedirs(base / "refer_seg", exist_ok=True)
    json.dump(refer, open(base / "refer_seg" / "toy.json", "w"))

    # reason_seg: image + labelme polygons + explanatory
    rroot = base / "reason_seg" / "ToySeg" / "train"
    save_img(str(rroot / "q0.jpg"))
    json.dump({"shapes": [
        {"label": "target", "points": [[5, 5], [30, 5], [30, 25], [5, 25]]},
        {"label": "ignore_zone",
         "points": [[40, 30], [60, 30], [60, 44], [40, 44]]}],
        "text": "the inflamed region near the top", "is_sentence": True},
        open(rroot / "q0.json", "w"))
    os.makedirs(base / "reason_seg" / "ToySeg" / "explanatory", exist_ok=True)
    json.dump([{"image": "q0.jpg", "query": "q", "outputs": "Because it is."}],
              open(base / "reason_seg" / "ToySeg" / "explanatory" /
                   "train.json", "w"))

    # vqa
    save_img(str(base / "vqa" / "images" / "v0.jpg"))
    json.dump([{"image": "v0.jpg", "conversations": [
        {"from": "human", "value": "<image>\nWhat organ is shown?"},
        {"from": "gpt", "value": "The liver."}]}],
        open(base / "vqa" / "llava_instruct_150k.json", "w"))
    return str(base)


def _cfg(hybrid_root, **kw):
    return HybridConfig(base_image_dir=hybrid_root, sam_image_size=64,
                        clip_image_size=56, samples_per_epoch=32,
                        sem_seg_data=("toy",), refer_seg_data=("toy",),
                        reason_seg_data="ToySeg|train", explanatory=1.0, **kw)


def test_polygons_to_mask_ignore_and_order():
    shapes = [
        {"label": "big", "points": [[0, 0], [20, 0], [20, 20], [0, 20]]},
        {"label": "ignore_small", "points": [[2, 2], [6, 2], [6, 6], [2, 6]]},
        {"label": "flag", "points": [[0, 0], [1, 0], [1, 1]]},
    ]
    m = polygons_to_mask(shapes, 24, 24)
    assert m[10, 10] == 1
    assert m[4, 4] == 255  # smaller ignore polygon painted last, wins
    assert set(np.unique(m)) <= {0, 1, 255}


def test_rle_matches_polygon_layout():
    rle = {"size": [4, 3], "counts": [2, 3, 7]}
    m = decode_rle(rle)
    assert m.shape == (4, 3)
    assert m.sum() == 3
    # column-major: zeros at (0,0),(1,0); ones at (2,0),(3,0),(0,1)
    assert m[2, 0] == 1 and m[3, 0] == 1 and m[0, 1] == 1 and m[1, 1] == 0
    poly = segmentation_to_mask([[1, 1, 9, 1, 9, 9, 1, 9]], 12, 12)
    assert poly[5, 5] == 1 and poly[0, 0] == 0


def test_each_source_sample_schema(hybrid_root):
    import random
    cfg = _cfg(hybrid_root)
    ds = HybridDataset(cfg, FakeTok())
    rng = random.Random(0)
    for src in ds.sources:
        s = src.sample(rng)
        assert s["image_sam"].shape == (64, 64, 3)
        assert s["image_clip"].shape == (56, 56, 3)
        assert len(s["input_ids"]) == len(s["labels"])
        for m in s["gt_masks"]:
            assert m.shape == (64, 64)
            assert set(np.unique(m)) <= {0.0, 1.0}  # ignore label dropped


def test_reason_seg_explanatory_answer(hybrid_root):
    import random
    src = ReasonSegSource(_cfg(hybrid_root), FakeTok())
    s = src.sample(random.Random(1))
    assert (np.asarray(s["labels"]) == 500).sum() == 1  # one <SEG> target


def test_hybrid_mixture_deterministic_and_collates(hybrid_root):
    ds = HybridDataset(_cfg(hybrid_root), FakeTok(),
                       sample_rates=(1, 1, 1, 1))
    assert len(ds) == 32
    a, b = ds[3], ds[3]
    np.testing.assert_array_equal(a["input_ids"], b["input_ids"])

    samples = [ds[i] for i in range(4)]
    cc = CollatorConfig(max_seq_len=96, max_segs=3, sam_image_size=64,
                        clip_image_size=56)
    arrays, _meta = collate(samples, cc)
    batch = to_model_batch(arrays)
    assert batch.input_ids.shape == (4, 96)
    assert batch.gt_masks.shape[0] == 4
