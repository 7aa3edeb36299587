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
