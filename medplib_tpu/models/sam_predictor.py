"""SAM predictor + automatic mask generation on SAM-Med2D.

Rebuilds the reference's predictor surface (segment_anything_med2d/
predictor.py, predictor_sammed.py: set_image -> cached embedding, predict
with point/box/mask prompts) and a compact automatic mask generator
(automatic_mask_generator.py: point-grid prompting -> IoU-prediction
filtering -> NMS dedup), batched on TPU: the whole point grid decodes in ONE
mask-decoder call instead of the reference's crops/batch loops.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.config import SamConfig
from medplib_tpu.data import preprocess as pp
from medplib_tpu.models import sam_med2d


class SamPredictor:
    def __init__(self, params: Dict, cfg: Optional[SamConfig] = None):
        self.params = params
        self.cfg = cfg or SamConfig()
        self._embed = jax.jit(lambda p, x: sam_med2d.encode_image(
            p["image_encoder"], x, self.cfg))
        self._decode = jax.jit(self._decode_fn, static_argnums=(4,))
        self.reset_image()

    def reset_image(self):
        self.features = None
        self.original_hw = None
        self.resize_hw = None

    def set_image(self, image_rgb: np.ndarray):
        """Compute and cache the image embedding (predictor.py set_image)."""
        pixels, self.resize_hw = pp.preprocess_sam(image_rgb,
                                                   self.cfg.image_size)
        self.original_hw = image_rgb.shape[:2]
        self.features = self._embed(self.params, jnp.asarray(pixels)[None])

    def _decode_fn(self, params, features, sparse, dense, multimask):
        pe = sam_med2d.dense_pe(params["prompt_encoder"], self.cfg)
        low_res, iou = sam_med2d.decode_masks(
            params["mask_decoder"], self.cfg, features, pe, sparse, dense,
            multimask_output=multimask)
        masks = sam_med2d.postprocess_masks(low_res, self.cfg.image_size)
        return masks, iou, low_res

    def _transform_coords(self, coords: np.ndarray) -> np.ndarray:
        """Original-image (x, y) -> model-input frame (resize + center pad)."""
        oh, ow = self.original_hw
        rh, rw = self.resize_hw
        scale = rh / oh
        top = (self.cfg.image_size - rh) // 2
        left = (self.cfg.image_size - rw) // 2
        out = coords.astype(np.float32) * scale
        out[..., 0] += left
        out[..., 1] += top
        return out

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                mask_input: Optional[np.ndarray] = None,
                multimask_output: bool = True):
        """-> (masks [M, H, W] bool at original size, iou [M],
        low_res [M, h', w'])."""
        assert self.features is not None, "call set_image first"
        points = None
        if point_coords is not None:
            pc = self._transform_coords(np.asarray(point_coords))[None]
            points = (jnp.asarray(pc), jnp.asarray(
                np.asarray(point_labels, np.float32)[None]))
        boxes = None
        if box is not None:
            b = np.asarray(box, np.float32).reshape(2, 2)
            boxes = jnp.asarray(self._transform_coords(b).reshape(1, 4))
        mi = None
        if mask_input is not None:
            mi = jnp.asarray(mask_input.astype(np.float32)[None, :, :, None])
        sparse, dense = sam_med2d.encode_prompts(
            self.params["prompt_encoder"], self.cfg, 1, points=points,
            boxes=boxes, mask_input=mi)
        masks, iou, low_res = self._decode(self.params, self.features,
                                           sparse, dense, multimask_output)
        out = []
        for m in np.asarray(masks[0]):
            out.append(pp.unpad_and_resize_mask(m, self.resize_hw,
                                                self.original_hw) > 0)
        return np.stack(out), np.asarray(iou[0]), np.asarray(low_res[0])


def _mask_iou_matrix(masks: np.ndarray) -> np.ndarray:
    flat = masks.reshape(masks.shape[0], -1).astype(np.float64)
    inter = flat @ flat.T
    area = flat.sum(-1)
    union = area[:, None] + area[None] - inter
    return inter / np.maximum(union, 1)


def generate_masks(predictor: SamPredictor, image_rgb: np.ndarray,
                   points_per_side: int = 16, pred_iou_thresh: float = 0.88,
                   nms_iou_thresh: float = 0.7,
                   min_area: int = 16) -> List[Dict]:
    """Automatic mask generation: uniform point grid -> batched single-point
    decode -> IoU filter -> greedy mask-NMS (automatic_mask_generator.py
    semantics, without crop pyramids)."""
    cfg = predictor.cfg
    predictor.set_image(image_rgb)
    h, w = image_rgb.shape[:2]
    xs = (np.arange(points_per_side) + 0.5) / points_per_side * w
    ys = (np.arange(points_per_side) + 0.5) / points_per_side * h
    grid = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2)  # [P, 2] (x,y)

    pc = predictor._transform_coords(grid)[:, None, :]  # [P, 1, 2]
    labels = jnp.ones((grid.shape[0], 1), jnp.float32)
    sparse, dense = sam_med2d.encode_prompts(
        predictor.params["prompt_encoder"], cfg, grid.shape[0],
        points=(jnp.asarray(pc), labels))
    feats = jnp.repeat(predictor.features, grid.shape[0], axis=0)
    masks, ious, _ = predictor._decode(predictor.params, feats, sparse,
                                       dense, True)
    masks = np.asarray(masks)   # [P, 3, S, S]
    ious = np.asarray(ious)     # [P, 3]

    flat_masks = masks.reshape(-1, masks.shape[-2], masks.shape[-1])
    flat_iou = ious.reshape(-1)
    keep = flat_iou > pred_iou_thresh
    flat_masks, flat_iou = flat_masks[keep], flat_iou[keep]
    binary = flat_masks > 0
    areas = binary.reshape(binary.shape[0], -1).sum(-1)
    big = areas >= min_area
    binary, flat_iou, areas = binary[big], flat_iou[big], areas[big]
    if len(binary) == 0:
        return []

    order = np.argsort(-flat_iou)
    iou_mat = _mask_iou_matrix(binary)
    selected = []
    for i in order:
        if all(iou_mat[i, j] < nms_iou_thresh for j in selected):
            selected.append(i)
    out = []
    for i in selected:
        full = pp.unpad_and_resize_mask(
            binary[i].astype(np.float32), predictor.resize_hw,
            predictor.original_hw) > 0.5
        out.append({"segmentation": full,
                    "predicted_iou": float(flat_iou[i]),
                    "area": int(full.sum())})
    return out
