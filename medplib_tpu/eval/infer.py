"""Evaluation driver: chunked data-parallel VQA + pixel-grounding inference.

Rebuilds /root/reference/model/eval/vqa_infer.py: loads a model, walks a test
JSON in `--num-chunks/--chunk-idx` shards (172-180, 291-293 — the
embarrassingly-parallel eval pattern; here each chunk is one host process on
one chip), runs `validate_vqa` (HF-generate equivalent: 429-442) or
`validate_seg` (model.evaluate equivalent: 488-633), writes answers jsonl and
computes metrics.

TPU-first: generation is the jit'd medplib.generate (single compiled program,
KV-cached scan) instead of the reference's token-by-token HF loop; batches
are static-shape buckets.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import numpy as np

from medplib_tpu.config import MedplibConfig
from medplib_tpu.data import preprocess as pp
from medplib_tpu.data.dataset import CollatorConfig, collate, to_model_batch
from medplib_tpu.eval import seg_metrics, vqa_metrics
from medplib_tpu.models import medplib


def get_chunk(items: Sequence, num_chunks: int, chunk_idx: int) -> List:
    """Contiguous chunking (vqa_infer.py split_list/get_chunk semantics)."""
    import math
    size = math.ceil(len(items) / num_chunks)
    chunks = [items[i:i + size] for i in range(0, len(items), size)]
    while len(chunks) < num_chunks:
        chunks.append([])
    return chunks[chunk_idx]


def truncate_prompt_at_colon(ids: np.ndarray, colon_id: int = 29901):
    """Cut the teacher-forced answer off at the last ':' token so generation
    starts at 'ASSISTANT:' (vqa_infer.py:426-428, 523-525)."""
    pos = np.where(ids == colon_id)[0]
    if len(pos) == 0:
        return ids
    return ids[: pos[-1] + 1]


@dataclass
class EvalConfig:
    num_chunks: int = 1
    chunk_idx: int = 0
    batch_size: int = 4
    max_new_tokens: int = 128
    colon_token_id: int = 29901  # llama ':' (vqa_infer.py:426)
    seg_threshold: float = seg_metrics.SIGMOID_THRESHOLD
    output_path: str = "answers.jsonl"
    vis_dir: Optional[str] = None


class Evaluator:
    def __init__(self, cfg: MedplibConfig, params, tokenizer,
                 ecfg: EvalConfig, collator: CollatorConfig,
                 rp_flag: bool = False, collate_fn=None):
        self.cfg, self.params, self.tok = cfg, params, tokenizer
        self.ecfg, self.cc = ecfg, collator
        # ICL eval passes icl_dataset.collate_icl (the reference's
        # vqa_infer.py:62-64, 288 switches dataset + collator contract for
        # --icl_enable); default is the LazySupervisedDataset collator
        self.collate_fn = collate_fn or collate
        self._gen = jax.jit(
            lambda p, b: medplib.generate(
                p, cfg, b, max_new_tokens=ecfg.max_new_tokens,
                eos_id=tokenizer.eos_token_id
                if hasattr(tokenizer, "eos_token_id") else 2,
                rp_flag=rp_flag))

    def _decode(self, ids: np.ndarray, n: int) -> str:
        ids = [int(t) for t in ids[:n] if t > 0]
        return self.tok.decode(ids, skip_special_tokens=False).replace(
            "</s>", "").strip()

    def _prepare_samples(self, samples, truncate: bool):
        if truncate:
            for s in samples:
                s = dict(s)
                s["input_ids"] = truncate_prompt_at_colon(
                    np.asarray(s["input_ids"]), self.ecfg.colon_token_id)
                s["labels"] = s["labels"][: len(s["input_ids"])]
                yield s
        else:
            yield from samples

    def run(self, dataset, mode: str = "vqa") -> Dict:
        """mode: 'vqa' (free-text answers + VQA metrics) or 'seg' (masks +
        IoU/Dice). Writes one jsonl line per sample."""
        idxs = get_chunk(list(range(len(dataset))), self.ecfg.num_chunks,
                         self.ecfg.chunk_idx)
        ecfg = self.ecfg
        records = []
        os.makedirs(os.path.dirname(os.path.abspath(ecfg.output_path)),
                    exist_ok=True)
        fout = open(ecfg.output_path, "w")
        B = ecfg.batch_size
        for start in range(0, len(idxs), B):
            batch_idxs = idxs[start:start + B]
            samples = [dataset[i] for i in batch_idxs]
            samples = list(self._prepare_samples(samples, truncate=True))
            while len(samples) < B:  # pad the final partial batch
                samples.append(samples[-1])
            arrays, meta = self.collate_fn(samples, self.cc)
            res = self._gen(self.params, to_model_batch(arrays))
            out_ids = np.asarray(res.output_ids)
            n_gen = np.asarray(res.num_generated)
            masks = np.asarray(res.pred_masks)
            for j, i in enumerate(batch_idxs):
                text = self._decode(out_ids[j], int(n_gen[j]))
                rec = {
                    "question_id": int(i),
                    "text": text,
                    "gt": (meta["gt_text"][j] or [""])[-1],
                    "answer_type": meta["answer_type"][j] or "open",
                    "image_path": meta["image_path"][j],
                }
                if mode == "seg":
                    gt_orig = (meta["gt_masks_original"][j] or [None])[0]
                    if gt_orig is not None and meta["resize_hw"][j]:
                        pred = pp.unpad_and_resize_mask(
                            masks[j, 0], meta["resize_hw"][j],
                            gt_orig.shape)
                        iou, dice = seg_metrics.sample_iou_dice(pred, gt_orig)
                        rec.update(iou=iou, dice=dice)
                        records.append({"pred_logits": pred,
                                        "gt_mask": gt_orig,
                                        "image_path": rec["image_path"]})
                        if ecfg.vis_dir:
                            self._save_vis(ecfg.vis_dir, i, pred, gt_orig,
                                           rec.get("image_path"))
                else:
                    records.append(rec)
                fout.write(json.dumps(
                    {k: v for k, v in rec.items()
                     if not isinstance(v, np.ndarray)}) + "\n")
        fout.close()
        if mode == "seg":
            return seg_metrics.evaluate_seg(records)
        return vqa_metrics.evaluate_vqa(records)

    def _save_vis(self, vis_dir, idx, pred_logits, gt, image_path=None):
        """Side-by-side [original | gt overlay | pred overlay] panel blended
        onto the source image (vqa_infer.py vis_overlay_masks, :362-392);
        falls back to raw pred/gt PNGs when the source isn't readable."""
        from PIL import Image
        os.makedirs(vis_dir, exist_ok=True)
        pred = seg_metrics.binarize_logits(pred_logits).astype(bool)
        gtb = gt > 0
        img = None
        if image_path and os.path.exists(str(image_path)):
            try:
                img = np.asarray(Image.open(image_path).convert("RGB"))
            except Exception:  # noqa: BLE001 - unreadable source
                img = None
        if img is None:
            Image.fromarray((pred * 255).astype(np.uint8)).save(
                os.path.join(vis_dir, f"{idx}_pred.png"))
            Image.fromarray((gtb * 255).astype(np.uint8)).save(
                os.path.join(vis_dir, f"{idx}_gt.png"))
            return
        if img.shape[:2] != pred.shape:
            img = np.asarray(Image.fromarray(img).resize(
                (pred.shape[1], pred.shape[0])))
        color = np.array([118, 158, 224], np.float32)  # ref overlay blue

        def blend(mask):
            ov = np.zeros_like(img, np.float32)
            ov[mask] = color
            out = img.astype(np.float32) * 0.5 + ov * 0.9
            return np.clip(out, 0, 255).astype(np.uint8)

        panel = np.concatenate([img, blend(gtb), blend(pred)], axis=1)
        Image.fromarray(panel).save(
            os.path.join(vis_dir, f"{idx}_overlay.png"))


def merge_chunk_outputs(paths: Sequence[str], out_path: str):
    """Concat per-chunk jsonl shards (infer_parallel_medplib.sh:86-93)."""
    with open(out_path, "w") as out:
        for p in paths:
            with open(p) as f:
                out.write(f.read())
