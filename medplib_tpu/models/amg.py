"""AMG mask postprocessing: RLE codecs + small-region cleanup.

Completes the automatic-mask-generator tail of the SAM-Med2D stack
(reference scope: /root/reference/model/segment_anything_med2d/
automatic_mask_generator.py postprocess_small_regions + output_mode, and
utils/amg.py:107-151 mask_to_rle_pytorch/rle_to_mask, 267-301
remove_small_regions/coco_encode_rle):

- uncompressed RLE in the pycocotools dict format (column-major counts,
  first count is the number of leading zeros), vectorized numpy instead of
  the reference's per-mask torch nonzero scan;
- COCO compressed RLE ("coco_rle") encoded/decoded natively — the COCO
  mask API's public wire format (5 data bits per char, 0x20 continuation
  flag, chars offset by 48, counts delta-coded against counts[i-2]) — so
  no pycocotools dependency is needed;
- small-region cleanup (hole filling + island removal below an area
  threshold via cv2 connected components, 8-connectivity) with the
  unchanged-preferred NMS re-dedup pass.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# uncompressed RLE (pycocotools dict format)
# ---------------------------------------------------------------------------

def mask_to_rle(mask: np.ndarray) -> Dict[str, Any]:
    """[H, W] bool -> {"size": [H, W], "counts": [...]} uncompressed RLE.

    Counts run down columns (Fortran order) and start with the number of
    leading zeros (possibly 0), alternating 0-run/1-run — the layout
    pycocotools and the reference's mask_to_rle_pytorch (utils/amg.py:107)
    emit. Vectorized: one flatten + one diff per mask.
    """
    h, w = mask.shape
    flat = np.asarray(mask, bool).reshape(-1, order="F")
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(bounds)
    counts = runs.tolist()
    if flat.size and flat[0]:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: Dict[str, Any]) -> np.ndarray:
    """Uncompressed RLE -> [H, W] bool (utils/amg.py:138 semantics)."""
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.int64)
    vals = (np.arange(len(counts)) % 2).astype(bool)  # 0-run, 1-run, ...
    flat = np.repeat(vals, counts)
    return flat.reshape(h, w, order="F")


def area_from_rle(rle: Dict[str, Any]) -> int:
    return int(sum(rle["counts"][1::2]))


# ---------------------------------------------------------------------------
# COCO compressed RLE string codec (the pycocotools wire format)
# ---------------------------------------------------------------------------

def _rle_counts_to_string(counts: List[int]) -> str:
    """COCO mask API compressed counts: LEB128-style, 5 data bits per
    char + 0x20 continuation bit, chars offset by 48; count i >= 3 is
    delta-coded against count i-2 (same-parity neighbor), which keeps
    the variable-length codes short for repetitive masks."""
    out = []
    for i, c in enumerate(counts):
        x = int(c) - (int(counts[i - 2]) if i > 2 else 0)
        while True:
            ch = x & 0x1F
            x >>= 5  # arithmetic shift: negatives converge to -1
            more = (x != -1) if (ch & 0x10) else (x != 0)
            if more:
                ch |= 0x20
            out.append(chr(ch + 48))
            if not more:
                break
    return "".join(out)


def _rle_string_to_counts(s: str) -> List[int]:
    counts: List[int] = []
    i = 0
    while i < len(s):
        x, k = 0, 0
        while True:
            ch = ord(s[i]) - 48
            x |= (ch & 0x1F) << k
            k += 5
            i += 1
            if not (ch & 0x20):
                if ch & 0x10:       # sign-extend the final 5-bit group
                    x |= -1 << k
                break
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def coco_encode_rle(uncompressed_rle: Dict[str, Any]) -> Dict[str, Any]:
    """Uncompressed RLE dict -> COCO compressed form with a str `counts`
    (JSON-serializable, utils/amg.py:294-301)."""
    return {"size": list(uncompressed_rle["size"]),
            "counts": _rle_counts_to_string(uncompressed_rle["counts"])}


def coco_decode_rle(coco_rle: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of coco_encode_rle (for round-trip tests / consumers)."""
    return {"size": list(coco_rle["size"]),
            "counts": _rle_string_to_counts(coco_rle["counts"])}


# ---------------------------------------------------------------------------
# small-region cleanup
# ---------------------------------------------------------------------------

def remove_small_regions(mask: np.ndarray, area_thresh: float,
                         mode: str) -> Tuple[np.ndarray, bool]:
    """Fill small holes ("holes") or drop small islands ("islands") below
    `area_thresh` pixels, 8-connected (utils/amg.py:267-291). Returns
    (mask, changed). In islands mode, if EVERY island is small the largest
    one is kept so the mask never empties.
    """
    import cv2

    assert mode in ("holes", "islands"), mode
    mask = np.asarray(mask, bool)
    # label the complement for hole analysis, the mask itself for islands
    work = (~mask if mode == "holes" else mask).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(work, 8)
    sizes = stats[1:, cv2.CC_STAT_AREA]        # component 0 is background
    small = np.flatnonzero(sizes < area_thresh) + 1
    if small.size == 0:
        return mask, False
    if mode == "holes":
        # small holes (complement components) are filled back into the mask
        return mask | np.isin(labels, small), True
    keep = np.setdiff1d(np.arange(1, n), small)
    if keep.size == 0:
        keep = np.array([int(np.argmax(sizes)) + 1])
    return np.isin(labels, keep), True


def postprocess_small_regions(records: List[Dict], min_area: int,
                              nms_thresh: float) -> List[Dict]:
    """Clean every record's mask (fill holes, drop islands < min_area),
    then re-run box NMS with score 1.0 for untouched masks and 0.0 for
    edited ones so duplicates created by the cleanup resolve in favor of
    masks that needed no repair (automatic_mask_generator.py:324-373).

    records: dicts with "segmentation" ([H, W] bool), "bbox", "area".
    Returns the surviving records with masks/boxes/areas updated.
    """
    from medplib_tpu.models.sam_predictor import _box_nms, _mask_to_box

    if not records:
        return records
    cleaned, scores = [], []
    for r in records:
        m = np.asarray(r["segmentation"], bool)
        m, ch_holes = remove_small_regions(m, min_area, "holes")
        m, ch_islands = remove_small_regions(m, min_area, "islands")
        cleaned.append(m)
        scores.append(0.0 if (ch_holes or ch_islands) else 1.0)

    masks = np.stack(cleaned)
    boxes = _mask_to_box(masks)
    keep = _box_nms(boxes, np.asarray(scores), nms_thresh)
    out = []
    for i in keep:
        r = dict(records[i])
        if scores[i] == 0.0:  # only edited masks need their fields redone
            r["segmentation"] = masks[i]
            r["bbox"] = boxes[i]
            r["area"] = int(masks[i].sum())
        out.append(r)
    return out
