"""Device-side fused preprocess (ops/device_preprocess.py) vs the host
recipe (data/preprocess.py — the reference-exact dual SAM/CLIP pipeline,
LazySupervisedDataset.py:444-556)."""

import numpy as np

from medplib_tpu.data import preprocess as pp
from medplib_tpu.ops.device_preprocess import (dual_preprocess, pick_bucket)


def test_matches_host_recipe_across_sizes():
    rng = np.random.default_rng(0)
    for (h, w) in [(300, 500), (640, 480), (256, 256), (123, 77),
                   (40, 513)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        sam_d, clip_d, rhw_d = dual_preprocess(img)
        sam_h, rhw_h = pp.preprocess_sam(img)
        clip_h = pp.preprocess_clip(img)
        assert rhw_d == tuple(rhw_h)
        # bound the difference in pre-normalize uint8 pixel units: the
        # device path evaluates the same separable triangle filter in f32
        # (the host/C++ path in f32 too; PIL would add ~1 LSB fixed-point)
        d_sam = np.abs(np.asarray(sam_d) - sam_h) * pp.SAM_PIXEL_STD
        d_clip = np.abs(np.asarray(clip_d) - clip_h) * pp.CLIP_STD * 255.0
        assert d_sam.max() < 0.1, (h, w, d_sam.max())
        assert d_clip.max() < 0.1, (h, w, d_clip.max())


def test_pad_region_is_exact():
    """Padding rows/cols must be EXACT (zeros for SAM post-normalize, the
    int-truncated CLIP mean pre-normalize) — the mask-decoder unpads by
    these coordinates."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(100, 300, 3), dtype=np.uint8)
    sam_d, clip_d, (nh, nw) = dual_preprocess(img)
    sam_d, clip_d = np.asarray(sam_d), np.asarray(clip_d)
    top = (256 - nh) // 2
    assert nh < 256  # landscape: vertical padding exists
    assert np.all(sam_d[:top] == 0.0) and np.all(sam_d[top + nh:] == 0.0)
    scale336 = 336 / 300
    nh336 = int(100 * scale336 + 0.5)
    top336 = (336 - nh336) // 2
    pad_expected = (pp.CLIP_PAD_VALUE / 255.0 - pp.CLIP_MEAN) / pp.CLIP_STD
    np.testing.assert_allclose(clip_d[0], np.broadcast_to(
        pad_expected, clip_d[0].shape), atol=1e-5)
    # interior row is NOT the pad value
    assert np.abs(clip_d[top336 + nh336 // 2] - pad_expected).max() > 0.1


def test_bucketing():
    assert pick_bucket(100, 200) == 512
    assert pick_bucket(600, 200) == 1024
    assert pick_bucket(2000, 100) == 2048
    assert pick_bucket(3000, 3000) == 3000
