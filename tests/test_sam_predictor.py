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
