"""Image-RAG: build a CLIP-embedding index over candidate (image, mask)
pairs, retrieve top-k neighbors as ICL examples.

Rebuild of /root/reference/model/rag/image_rag.py: embeddings are the
L2-normalized mean of CLIP patch tokens (116-131), `build` persists
embeddings.npy + metadata.json (134-154), `augment` attaches the top-k
cosine neighbors as `icl_examples` to each test record (164-197).

TPU-first: candidates are encoded in one jit'd batched forward (the
reference encodes per-image through HF CLIPVisionModel).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.config import ClipVisionConfig
from medplib_tpu.data import preprocess as pp
from medplib_tpu.models import clip


class ImageRagEncoder:
    """CLIP vision encoder -> one embedding per image."""

    def __init__(self, clip_params, cfg: ClipVisionConfig,
                 batch_size: int = 16):
        self.params = clip_params
        self.cfg = cfg
        self.batch_size = batch_size
        self._fwd = jax.jit(self._embed_batch)

    def _embed_batch(self, pixels: jnp.ndarray) -> jnp.ndarray:
        feats = clip.forward_features(self.params, pixels, self.cfg)
        emb = feats.mean(axis=1)  # mean of patch tokens (image_rag.py:125)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_paths(self, paths: Sequence[str]) -> np.ndarray:
        out = []
        B = self.batch_size
        size = self.cfg.image_size
        for start in range(0, len(paths), B):
            chunk = paths[start:start + B]
            pixels = np.stack([
                pp.preprocess_clip(pp.load_image_rgb(p), size)
                for p in chunk])
            pad = B - len(chunk)
            if pad:
                pixels = np.concatenate(
                    [pixels, np.zeros((pad,) + pixels.shape[1:],
                                      pixels.dtype)])
            emb = np.asarray(self._fwd(jnp.asarray(pixels)))
            out.append(emb[: len(chunk)])
        return np.concatenate(out) if out else np.zeros((0, 1))


def collect_candidates(candidate_json: str, image_folder: str) -> List[Dict]:
    """Candidate pool entries: records with 'image' and a '<mask>' target
    (image_rag.py:64-86)."""
    with open(candidate_json) as f:
        records = json.load(f)
    out = []
    for rec in records:
        if "image" not in rec:
            continue
        mask = None
        for turn in rec.get("conversations", []):
            import re
            m = re.search(r"<mask>(.*?)</mask>", str(turn.get("value", "")))
            if m:
                mask = m.group(1)
        path = rec["image"]
        if not os.path.isabs(path):
            path = os.path.join(image_folder, path)
        out.append({"image": path, "mask": mask, "record": rec})
    return out


def build_index(candidate_json: str, image_folder: str, out_dir: str,
                encoder: ImageRagEncoder) -> Dict:
    cands = collect_candidates(candidate_json, image_folder)
    emb = encoder.encode_paths([c["image"] for c in cands])
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "embeddings.npy"), emb)
    meta = [{"image": c["image"], "mask": c["mask"]} for c in cands]
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return {"count": len(cands), "dim": int(emb.shape[-1] if len(emb) else 0)}


def augment(test_json: str, index_dir: str, out_json: str,
            encoder: ImageRagEncoder, top_k: int = 1,
            image_folder: str = "") -> int:
    """Attach `icl_examples` (top-k cosine neighbors) to every test record
    (image_rag.py:164-197)."""
    emb = np.load(os.path.join(index_dir, "embeddings.npy"))
    with open(os.path.join(index_dir, "metadata.json")) as f:
        meta = json.load(f)
    with open(test_json) as f:
        tests = json.load(f)

    paths = []
    for rec in tests:
        p = rec["image"]
        if not os.path.isabs(p):
            p = os.path.join(image_folder, p)
        paths.append(p)
    queries = encoder.encode_paths(paths)
    sims = queries @ emb.T  # cosine (both normalized)
    order = np.argsort(-sims, axis=1)[:, :top_k]
    for rec, idxs in zip(tests, order):
        rec["icl_examples"] = [
            {"image": meta[i]["image"], "mask": meta[i]["mask"]}
            for i in idxs]
    with open(out_json, "w") as f:
        json.dump(tests, f)
    return len(tests)


def main():
    import argparse
    ap = argparse.ArgumentParser(description="image-RAG index build/augment")
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--candidates", required=True)
    b.add_argument("--image-folder", default="")
    b.add_argument("--out-dir", required=True)
    b.add_argument("--clip-checkpoint", required=True)
    a = sub.add_parser("augment")
    a.add_argument("--test-json", required=True)
    a.add_argument("--index-dir", required=True)
    a.add_argument("--out-json", required=True)
    a.add_argument("--image-folder", default="")
    a.add_argument("--top-k", type=int, default=1)
    a.add_argument("--clip-checkpoint", required=True)
    args = ap.parse_args()

    from medplib_tpu.utils.checkpoint import load_params
    cfg = ClipVisionConfig()
    params = load_params(args.clip_checkpoint)
    enc = ImageRagEncoder(params, cfg)
    if args.cmd == "build":
        print(build_index(args.candidates, args.image_folder, args.out_dir,
                          enc))
    else:
        n = augment(args.test_json, args.index_dir, args.out_json, enc,
                    args.top_k, args.image_folder)
        print(f"augmented {n} records -> {args.out_json}")


if __name__ == "__main__":
    main()
