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
