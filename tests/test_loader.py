"""PrefetchLoader: threaded loading must be byte-identical to synchronous
loading (deterministic index stream), and worker errors must surface."""

import numpy as np
import pytest

from medplib_tpu.data.dataset import CollatorConfig
from medplib_tpu.data.loader import PrefetchLoader


class FakeDataset:
    """Minimal dataset producing collate-compatible samples."""

    def __init__(self, n=12, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise RuntimeError(f"corrupt sample {i}")
        rng = np.random.default_rng(i)
        L = 5 + i % 4
        return {
            "input_ids": rng.integers(3, 100, size=L),
            "labels": np.full(L, -100, np.int64),
            "image_clip": rng.normal(size=(16, 16, 3)).astype(np.float32),
            "image_sam": rng.uniform(0, 255, (32, 32, 3)).astype(np.float32),
            "resize_hw": (32, 32), "original_hw": (32, 32),
            "gt_masks": [], "gt_masks_original": [],
            "question": ["q"], "gt": [""], "image_path": None,
            "answer_type": None,
        }


CC = CollatorConfig(max_seq_len=16, image_tokens=4, sam_image_size=32,
                    clip_image_size=16)


def _take(loader, n):
    out = []
    it = iter(loader)
    for _ in range(n):
        out.append(next(it))
    return out


def test_threaded_matches_synchronous():
    ds = FakeDataset(12)
    kw = dict(cc=CC, batch_size=3, accum_steps=2, seed=7)
    sync = _take(PrefetchLoader(ds, num_workers=0, **kw), 4)
    par = _take(PrefetchLoader(ds, num_workers=3, **kw), 4)
    for a, b in zip(sync, par):
        fa = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(a)]
        fb = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(b)]
        assert len(fa) == len(fb)
        for x, y in zip(fa, fb):
            np.testing.assert_array_equal(x, y)


def test_shapes_follow_accum_contract():
    batch = _take(PrefetchLoader(FakeDataset(8), CC, batch_size=2,
                                 accum_steps=3, num_workers=2), 1)[0]
    assert batch.input_ids.shape[:2] == (3, 2)  # [accum, batch, ...]


def test_worker_error_propagates():
    loader = PrefetchLoader(FakeDataset(8, fail_at=5), CC, batch_size=4,
                            accum_steps=1, num_workers=2, seed=0)
    with pytest.raises(RuntimeError, match="corrupt sample"):
        _take(loader, 3)
