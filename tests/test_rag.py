"""Image-RAG: index build + top-k augment on synthetic data."""

import json
import os

import jax
import numpy as np
import pytest

from medplib_tpu.config import ClipVisionConfig
from medplib_tpu.models import clip
from medplib_tpu.rag import image_rag


@pytest.fixture(scope="module")
def encoder():
    cfg = ClipVisionConfig.tiny()
    params = clip.init_clip_vision(jax.random.PRNGKey(0), cfg)
    return image_rag.ImageRagEncoder(params, cfg, batch_size=4)


def _write_images(tmp_path, n):
    from PIL import Image
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = (rng.uniform(0, 255, (40, 40, 3))).astype(np.uint8)
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
    return paths


def test_build_and_augment(tmp_path, encoder):
    paths = _write_images(tmp_path, 5)
    cands = [{"image": p, "conversations": [
        {"from": "gpt", "value": f"<SEG> <mask>m{i}.png</mask>"}]}
        for i, p in enumerate(paths)]
    cand_json = str(tmp_path / "cands.json")
    json.dump(cands, open(cand_json, "w"))

    out_dir = str(tmp_path / "index")
    info = image_rag.build_index(cand_json, "", out_dir, encoder)
    assert info["count"] == 5
    emb = np.load(os.path.join(out_dir, "embeddings.npy"))
    assert emb.shape[0] == 5
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-4)

    # query with one of the candidate images -> itself must be top-1
    tests = [{"image": paths[2], "conversations": []}]
    test_json = str(tmp_path / "test.json")
    json.dump(tests, open(test_json, "w"))
    out_json = str(tmp_path / "aug.json")
    n = image_rag.augment(test_json, out_dir, out_json, encoder, top_k=2)
    assert n == 1
    aug = json.load(open(out_json))
    assert aug[0]["icl_examples"][0]["image"] == paths[2]
    assert aug[0]["icl_examples"][0]["mask"] == "m2.png"
    assert len(aug[0]["icl_examples"]) == 2


def test_encoder_registry_rejects_unknown():
    with pytest.raises(ValueError, match="unknown RAG encoder type"):
        image_rag.make_encoder("bogus_encoder")


def test_encoder_registry_types():
    assert set(image_rag.RAG_ENCODER_DEFAULT_PATHS) == {
        "clip_encoder", "med_encoder", "det_encoder", "mask_encoder"}


def test_make_encoder_loads_each_type(tmp_path, monkeypatch):
    """Every registry type resolves its default path under the root and
    loads a CLIP-family encoder (image_rag.py:92-115)."""
    import jax
    from medplib_tpu.config import ClipVisionConfig
    from medplib_tpu.models.clip import init_clip_vision
    from medplib_tpu.utils.checkpoint import save_params

    cfg = ClipVisionConfig.tiny()
    params = init_clip_vision(jax.random.PRNGKey(0), cfg)
    monkeypatch.setenv("MEDPLIB_RAG_ENCODER_ROOT", str(tmp_path))
    for t, sub in image_rag.RAG_ENCODER_DEFAULT_PATHS.items():
        save_params(str(tmp_path / sub), params)
        enc = image_rag.make_encoder(t, cfg=cfg, batch_size=2)
        assert enc.encoder_type == t


def test_candidate_extraction_priority(tmp_path):
    """target_mask > mask > mask3 > inline tag; imageN/maskN and
    icl_examples pairs all enter the pool (image_rag.py:38-87)."""
    recs = [
        {"image": "a.png", "target_mask": "tm.png", "mask": "m.png"},
        {"image": "b.png",
         "conversations": [{"value": "seg <mask>inline.png</mask>"}]},
        {"image2": "c2.png", "mask2": "cm2.png"},
        {"image": "d.png", "mask": "dm.png",
         "icl_examples": [{"image": "e.png", "mask": "em.png"}]},
        {"image": "nomask.png"},
    ]
    p = tmp_path / "cands.json"
    p.write_text(json.dumps(recs))
    cands = image_rag.collect_candidates(str(p), "/imgs")
    pairs = {(c["image"], c["mask"]) for c in cands}
    assert ("/imgs/a.png", "tm.png") in pairs          # priority: target_mask
    assert ("/imgs/b.png", "inline.png") in pairs      # inline tag fallback
    assert ("/imgs/c2.png", "cm2.png") in pairs        # imageN/maskN
    assert ("/imgs/d.png", "dm.png") in pairs
    assert ("/imgs/e.png", "em.png") in pairs          # icl example pool
    assert not any(c["image"].endswith("nomask.png") for c in cands)
