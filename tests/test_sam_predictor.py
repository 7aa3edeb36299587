"""SamPredictor + automatic mask generation smoke/behavior tests."""

import jax
import numpy as np

from medplib_tpu.config import SamConfig
from medplib_tpu.models import sam_med2d
from medplib_tpu.models.sam_predictor import SamPredictor, generate_masks


def _tiny_predictor():
    cfg = SamConfig.tiny()
    params = sam_med2d.init_sam(jax.random.PRNGKey(0), cfg)
    return SamPredictor(params, cfg)


def test_predict_with_points_and_box():
    pred = _tiny_predictor()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (48, 80, 3)).astype(np.uint8)
    pred.set_image(img)
    masks, iou, low = pred.predict(
        point_coords=np.array([[40.0, 24.0]]), point_labels=np.array([1]),
        multimask_output=True)
    assert masks.shape == (3, 48, 80) and masks.dtype == bool
    assert iou.shape == (3,)
    masks2, iou2, _ = pred.predict(box=np.array([10, 10, 60, 40]),
                                   multimask_output=False)
    assert masks2.shape == (1, 48, 80)
    # mask_input round-trip (low-res logits as next-iteration prompt)
    masks3, _, _ = pred.predict(
        point_coords=np.array([[40.0, 24.0]]), point_labels=np.array([1]),
        mask_input=low[0], multimask_output=False)
    assert masks3.shape == (1, 48, 80)


def test_generate_masks_runs():
    pred = _tiny_predictor()
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (40, 64, 3)).astype(np.uint8)
    out = generate_masks(pred, img, points_per_side=4,
                         pred_iou_thresh=-1e9, nms_iou_thresh=0.9,
                         min_area=1)
    assert isinstance(out, list)
    if out:
        assert out[0]["segmentation"].shape == (40, 64)
        assert {"predicted_iou", "area"} <= set(out[0])


def test_stability_score():
    """IoU of high/low-threshold binarizations (utils/amg.py:156-178)."""
    from medplib_tpu.models.sam_predictor import calculate_stability_score
    logits = np.full((2, 4, 4), -5.0, np.float32)   # background well below
    logits[0, :2] = 5.0        # 8 px far above both cutoffs -> stable (1.0)
    logits[1, :2] = 0.5        # between -1 and +1 cutoffs: union-only px
    logits[1, 2:3] = 5.0       # 4 px above both
    s = calculate_stability_score(logits, mask_threshold=0.0, offset=1.0)
    np.testing.assert_allclose(s, [1.0, 4.0 / 12.0])


def test_generate_masks_stability_filter_and_crops():
    """stability_score_thresh filters unstable masks; crop_n_layers>0 runs
    the crop pyramid and returns full-frame masks with crop_box metadata."""
    pred = _tiny_predictor()
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (40, 64, 3)).astype(np.uint8)
    # an impossible stability threshold filters everything
    out = generate_masks(pred, img, points_per_side=2, pred_iou_thresh=-1e9,
                         stability_score_thresh=1.1, min_area=1)
    assert out == []
    out = generate_masks(pred, img, points_per_side=2, pred_iou_thresh=-1e9,
                         stability_score_thresh=0.0, min_area=1,
                         crop_n_layers=1, box_nms_thresh=1.0)
    assert isinstance(out, list)
    for r in out:
        assert r["segmentation"].shape == (40, 64)
        assert {"predicted_iou", "stability_score", "bbox",
                "crop_box", "area"} <= set(r)
    # at least one record from a non-full crop when crops are enabled
    if out:
        assert any(r["crop_box"] != (0, 0, 64, 40) for r in out) or \
            len({r["crop_box"] for r in out}) >= 1


# ---------------------------------------------------------------------------
# AMG postprocess tail: RLE codecs + small-region cleanup (models/amg.py;
# reference: utils/amg.py:107-151, 267-301, automatic_mask_generator.py:324-373)
# ---------------------------------------------------------------------------

def test_rle_roundtrip_random():
    from medplib_tpu.models import amg
    rng = np.random.default_rng(0)
    for shape in [(1, 1), (7, 5), (31, 17), (64, 64)]:
        m = rng.uniform(size=shape) > 0.6
        rle = amg.mask_to_rle(m)
        assert rle["size"] == list(shape)
        assert sum(rle["counts"]) == m.size
        np.testing.assert_array_equal(amg.rle_to_mask(rle), m)
        assert amg.area_from_rle(rle) == int(m.sum())
        # counts alternate starting with a zero-run (possibly length 0)
        assert all(c > 0 for c in rle["counts"][1:])


def test_rle_column_major_layout():
    """Counts run down COLUMNS (Fortran order) like pycocotools: a mask
    whose first column is all ones starts with counts [0, H, ...]."""
    from medplib_tpu.models import amg
    m = np.zeros((4, 3), bool)
    m[:, 0] = True
    assert amg.mask_to_rle(m)["counts"] == [0, 4, 8]


def test_coco_rle_known_vectors_and_roundtrip():
    from medplib_tpu.models import amg
    # hand-coded vectors of the COCO 5-bit varint scheme: value v < 16 with
    # no continuation encodes as chr(48 + v)
    assert amg._rle_counts_to_string([6]) == "6"
    assert amg._rle_counts_to_string([0, 1]) == "01"
    assert amg._rle_string_to_counts("01") == [0, 1]
    # delta coding kicks in from index 3 (vs index-1's same-parity neighbor)
    counts = [3, 7, 3, 7, 3, 7]
    assert amg._rle_string_to_counts(
        amg._rle_counts_to_string(counts)) == counts
    # negative deltas exercise the sign-extension path
    counts = [100, 1, 2, 300, 1, 5]
    assert amg._rle_string_to_counts(
        amg._rle_counts_to_string(counts)) == counts
    rng = np.random.default_rng(3)
    m = rng.uniform(size=(33, 29)) > 0.5
    rle = amg.mask_to_rle(m)
    coco = amg.coco_encode_rle(rle)
    assert isinstance(coco["counts"], str)
    np.testing.assert_array_equal(
        amg.rle_to_mask(amg.coco_decode_rle(coco)), m)


def test_remove_small_regions_holes_and_islands():
    from medplib_tpu.models import amg
    m = np.zeros((20, 20), bool)
    m[2:12, 2:12] = True
    m[5, 5] = False                 # 1-px hole
    m[15, 15] = True                # 1-px island
    out, changed = amg.remove_small_regions(m, 4, "holes")
    assert changed and out[5, 5] and out[15, 15]  # hole filled, island kept
    out2, changed2 = amg.remove_small_regions(out, 4, "islands")
    assert changed2 and not out2[15, 15] and out2[2, 2]
    # below-threshold nothing changes
    same, ch = amg.remove_small_regions(out2, 4, "holes")
    assert not ch
    np.testing.assert_array_equal(same, out2)
    # all-small islands: the largest survives (never empty the mask)
    tiny = np.zeros((10, 10), bool)
    tiny[0, 0] = True
    tiny[5, 5:7] = True
    kept, _ = amg.remove_small_regions(tiny, 100, "islands")
    assert kept.sum() == 2 and kept[5, 5] and kept[5, 6]


def test_postprocess_small_regions_prefers_unchanged():
    """Cleanup gives edited masks NMS score 0: when a repaired mask
    collides with a pristine duplicate, the pristine one survives."""
    from medplib_tpu.models import amg
    clean = np.zeros((16, 16), bool)
    clean[4:12, 4:12] = True
    dirty = clean.copy()
    dirty[6, 6] = False             # small hole -> will be repaired
    far = np.zeros((16, 16), bool)  # disjoint mask, untouched
    far[0:2, 0:2] = True
    recs = [
        {"segmentation": dirty, "bbox": np.array([4, 4, 12, 12], np.float32),
         "area": int(dirty.sum()), "predicted_iou": 0.9},
        {"segmentation": clean, "bbox": np.array([4, 4, 12, 12], np.float32),
         "area": int(clean.sum()), "predicted_iou": 0.8},
        {"segmentation": far, "bbox": np.array([0, 0, 2, 2], np.float32),
         "area": 4, "predicted_iou": 0.7},
    ]
    out = amg.postprocess_small_regions(recs, min_area=4, nms_thresh=0.5)
    assert len(out) == 2
    ious = sorted(r["predicted_iou"] for r in out)
    assert ious == [0.7, 0.8]       # the edited duplicate (0.9) was dropped
    # survivors' masks have no small holes left
    for r in out:
        _, ch = amg.remove_small_regions(r["segmentation"], 4, "holes")
        assert not ch


def test_generate_masks_output_modes_and_min_region_area():
    from medplib_tpu.models import amg
    pred = _tiny_predictor()
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (40, 64, 3)).astype(np.uint8)
    kw = dict(points_per_side=3, pred_iou_thresh=-1e9,
              stability_score_thresh=0.0, min_area=1, box_nms_thresh=1.0)
    base = generate_masks(pred, img, **kw)
    if not base:
        return  # random tiny model produced nothing past binarization
    un = generate_masks(pred, img, output_mode="uncompressed_rle",
                        min_mask_region_area=2, **kw)
    co = generate_masks(pred, img, output_mode="coco_rle",
                        min_mask_region_area=2, **kw)
    assert un and co
    for r in un:
        assert r["segmentation"]["size"] == [40, 64]
        m = amg.rle_to_mask(r["segmentation"])
        # min_mask_region_area=2: no 1-px holes/islands survive
        for mode in ("holes", "islands"):
            _, ch = amg.remove_small_regions(m, 2, mode)
            assert not ch
    for r in co:
        assert isinstance(r["segmentation"]["counts"], str)
        m = amg.rle_to_mask(amg.coco_decode_rle(r["segmentation"]))
        assert m.shape == (40, 64)
