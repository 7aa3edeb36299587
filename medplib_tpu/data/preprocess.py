"""Host-side image preprocessing (numpy/cv2/PIL), matching the reference's
dual SAM/CLIP recipe exactly (LazySupervisedDataset.py:444-556):

SAM path:  ResizeLongestSide(256) -> normalize (ImageNet*255 stats) ->
           center-pad to 256x256 with zeros (pad AFTER normalize)
CLIP path: ResizeLongestSide(336) -> center-pad to 336x336 with the
           int-truncated CLIP pixel mean (pad BEFORE normalize) ->
           rescale 1/255 -> CLIP mean/std normalize
Region:    ResizeLongestSide(336) on the mask -> center-pad 336 ->
           1/14 nearest downsample to 24x24 (LazySupervisedDataset.py:505-520)
           -> training-time random sub-component augmentation (274-348)

ResizeLongestSide matches the vanilla-SAM transform the reference imports
(segment_anything/utils/transforms.py): PIL bilinear resize of the longest
side to target, preserving aspect.

These run on CPU in data-loader workers (with the C++ fast path in
medplib_tpu/native). The serving worker can instead run the fused
DEVICE-side preprocess — resize+pad+normalize as two MXU matmuls —
in ops/device_preprocess.py (serve/worker.py device_preprocess flag).
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
# the reference pads with the int-truncated mean (LazySupervisedDataset.py:398)
CLIP_PAD_VALUE = np.clip((CLIP_MEAN * 255).astype(np.int32), 0, 255)


def resize_longest_side(image: np.ndarray, target: int) -> np.ndarray:
    """[H, W, C] or [H, W] -> longest side == target, PIL bilinear."""
    h, w = image.shape[:2]
    scale = target / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    pil = Image.fromarray(image)
    out = pil.resize((nw, nh), Image.BILINEAR)
    return np.asarray(out)


def center_pad(x: np.ndarray, size: int, pad_value) -> np.ndarray:
    """Pad [H, W, C]/[H, W] to [size, size, ...] with the reference's
    top/left = pad//2 split (pad_tensor_channelwise)."""
    h, w = x.shape[:2]
    pad_h, pad_w = size - h, size - w
    top, left = pad_h // 2, pad_w // 2
    if x.ndim == 3:
        out = np.empty((size, size, x.shape[2]), x.dtype)
        out[...] = pad_value
        out[top:top + h, left:left + w] = x
    else:
        out = np.full((size, size), pad_value, x.dtype)
        out[top:top + h, left:left + w] = x
    return out


def _native():
    """C++ fast path (medplib_tpu/native) — lazy, cached, optional."""
    global _NATIVE
    if _NATIVE is _UNSET:
        try:
            from medplib_tpu import native
            _NATIVE = native if native.available() else None
        except Exception:
            _NATIVE = None
    return _NATIVE


_UNSET = object()
_NATIVE = _UNSET
USE_NATIVE = True


def preprocess_sam(image_rgb: np.ndarray, size: int = 256):
    """-> (pixels [size, size, 3] f32 normalized, resize_hw before pad)."""
    nat = _native() if USE_NATIVE else None
    if nat is not None and image_rgb.ndim == 3 and image_rgb.dtype == np.uint8:
        return nat.sam_preprocess(image_rgb, size, SAM_PIXEL_MEAN,
                                  SAM_PIXEL_STD)
    resized = resize_longest_side(image_rgb, size)
    resize_hw = resized.shape[:2]
    x = (resized.astype(np.float32) - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    return center_pad(x, size, 0.0), resize_hw


def preprocess_clip(image_rgb: np.ndarray, size: int = 336) -> np.ndarray:
    """-> [size, size, 3] f32, CLIP-normalized (HF processor equivalent on an
    already-square input)."""
    nat = _native() if USE_NATIVE else None
    if nat is not None and image_rgb.ndim == 3 and image_rgb.dtype == np.uint8:
        return nat.clip_preprocess(image_rgb, size, CLIP_MEAN, CLIP_STD)
    resized = resize_longest_side(image_rgb, size)
    padded = center_pad(resized.astype(np.float32), size,
                        CLIP_PAD_VALUE.astype(np.float32))
    return (padded / 255.0 - CLIP_MEAN) / CLIP_STD


def preprocess_region_mask(mask: np.ndarray, clip_size: int = 336,
                           patch: int = 14) -> np.ndarray:
    """Binary region mask at original res -> [clip_size/patch]^2 grid."""
    resized = resize_longest_side(mask.astype(np.uint8), clip_size)
    padded = center_pad(resized, clip_size, 0)
    grid = clip_size // patch
    # 1/14 nearest-neighbor downsample (cv2.resize INTER_NEAREST fx=1/14)
    idx = (np.arange(grid) * patch).astype(np.int64)
    return padded[np.ix_(idx, idx)].astype(np.float32)


def sub_component_augment(mask: np.ndarray, min_area: float = 0.2,
                          max_area: float = 1.0, min_thresh: int = 10,
                          rng: Optional[random.Random] = None
                          ) -> Tuple[np.ndarray, bool]:
    """Random connected-sub-component augmentation
    (LazySupervisedDataset.py:274-348): pick the largest connected component,
    grow a random connected subregion covering a `min_area..max_area`
    fraction of it. Returns (mask', is_valid)."""
    rng = rng or random
    if mask.sum() <= 0:
        return np.ones_like(mask), False
    try:
        import cv2
        num, labels = cv2.connectedComponents(mask.astype(np.uint8))
    except ImportError:
        labels = _connected_components(mask.astype(np.uint8))
        num = labels.max() + 1
    if num <= 1:
        return mask, True
    areas = [(labels == v).sum() for v in range(1, num)]
    component = (labels == (1 + int(np.argmax(areas)))).astype(np.uint8)
    comp_area = int(component.sum())
    if comp_area < min_thresh:
        return component.astype(mask.dtype), True

    # bounded resample: comp_area == min_thresh can never satisfy the
    # threshold (uniform() < 1.0 -> int() rounds below it), so clamp after a
    # few draws instead of looping forever (the reference has the same
    # unbounded loop, LazySupervisedDataset.py:316-319)
    target_area = 0
    for _ in range(8):
        ratio = rng.uniform(min_area, max_area)
        target_area = int(comp_area * ratio)
        if target_area >= min_thresh:
            break
    else:
        target_area = min(comp_area, min_thresh)

    sub = np.zeros_like(component)
    rows, cols = np.where(component == 1)
    start = rng.choice(list(zip(rows.tolist(), cols.tolist())))
    stack = [start]
    h, w = component.shape
    while stack:
        y, x = stack.pop()
        sub[y, x] = 1
        if sub.sum() >= target_area:
            break
        neigh = [(y + dy, x + dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        rng.shuffle(neigh)
        for ny, nx in neigh:
            if 0 <= ny < h and 0 <= nx < w and component[ny, nx] == 1 \
                    and sub[ny, nx] == 0:
                stack.append((ny, nx))
    return sub.astype(mask.dtype), True


def _connected_components(mask: np.ndarray) -> np.ndarray:
    """4-connected labeling fallback when cv2 is unavailable."""
    h, w = mask.shape
    labels = np.zeros((h, w), np.int32)
    cur = 0
    for sy in range(h):
        for sx in range(w):
            if mask[sy, sx] and not labels[sy, sx]:
                cur += 1
                stack = [(sy, sx)]
                labels[sy, sx] = cur
                while stack:
                    y, x = stack.pop()
                    for ny, nx in ((y-1, x), (y+1, x), (y, x-1), (y, x+1)):
                        if 0 <= ny < h and 0 <= nx < w and mask[ny, nx] \
                                and not labels[ny, nx]:
                            labels[ny, nx] = cur
                            stack.append((ny, nx))
    return labels


def load_image_rgb(path: str) -> np.ndarray:
    """cv2 BGR read + RGB convert (LazySupervisedDataset.py:530-532), PIL
    fallback."""
    try:
        import cv2
        img = cv2.imread(path)
        if img is None:
            raise IOError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        return np.asarray(Image.open(path).convert("RGB"))


def unpad_and_resize_mask(mask_logits: np.ndarray, resize_hw, original_hw):
    """Reference postprocess_masks (MedPLIB.py:682-702): crop the centered
    valid region then bilinear-resize to the original image size.
    mask_logits: [H, W] in the padded SAM frame."""
    fh, fw = mask_logits.shape
    pad_h, pad_w = fh - resize_hw[0], fw - resize_hw[1]
    top, left = pad_h // 2, pad_w // 2
    crop = mask_logits[top:top + resize_hw[0], left:left + resize_hw[1]]
    pil = Image.fromarray(crop.astype(np.float32), mode="F")
    out = pil.resize((original_hw[1], original_hw[0]), Image.BILINEAR)
    return np.asarray(out)
