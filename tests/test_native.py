"""Native C++ preprocessing vs the PIL/numpy reference path."""

import numpy as np
import pytest

from medplib_tpu import native
from medplib_tpu.data import preprocess as pp

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3)).astype(np.uint8)


def test_sam_preprocess_matches_python():
    img = _img(180, 240)
    want, want_hw = pp.preprocess_sam(img, 256)
    got, got_hw = native.sam_preprocess(img, 256, pp.SAM_PIXEL_MEAN,
                                        pp.SAM_PIXEL_STD)
    assert got_hw == want_hw
    # PIL uses 8-bit fixed-point resampling; float path agrees within 1 gray
    # level scaled by std
    tol = 1.05 / pp.SAM_PIXEL_STD.min()
    assert np.abs(got - want).max() < tol


def test_clip_preprocess_matches_python():
    img = _img(100, 300, seed=1)
    want = pp.preprocess_clip(img, 336)
    got = native.clip_preprocess(img, 336, pp.CLIP_MEAN, pp.CLIP_STD)
    tol = (1.0 / 255.0) / pp.CLIP_STD.min() * 1.5
    assert np.abs(got - want).max() < tol
    # padding region must match exactly (constant values)
    assert np.abs(got[0, 0] - want[0, 0]).max() < 1e-5


def test_upscale_small_image():
    img = _img(20, 30, seed=2)
    want, want_hw = pp.preprocess_sam(img, 256)
    got, got_hw = native.sam_preprocess(img, 256, pp.SAM_PIXEL_MEAN,
                                        pp.SAM_PIXEL_STD)
    assert got_hw == want_hw == (171, 256)
    assert np.abs(got - want).max() < 1.0 / pp.SAM_PIXEL_STD.min()


def test_sparse_mask_encode_matches():
    m = np.zeros((30, 40), np.uint8)
    m[3, 5] = m[10, 20] = m[29, 39] = 1
    got = native.encode_sparse_mask(m)
    want = np.transpose(np.nonzero(m))
    np.testing.assert_array_equal(got, want)


def test_native_is_faster_than_pil():
    import time
    img = _img(512, 768, seed=3)
    native.sam_preprocess(img, 256, pp.SAM_PIXEL_MEAN, pp.SAM_PIXEL_STD)
    t0 = time.time()
    for _ in range(10):
        native.sam_preprocess(img, 256, pp.SAM_PIXEL_MEAN, pp.SAM_PIXEL_STD)
    t_native = time.time() - t0
    t0 = time.time()
    for _ in range(10):
        pp.preprocess_sam(img, 256)
    t_py = time.time() - t0
    # informational: only assert it's not catastrophically slower
    print(f"native {t_native*100:.1f}ms/10 vs python {t_py*100:.1f}ms/10")
    assert t_native < t_py * 3
