"""VQA + seg metrics vs the reference implementations (oracle, read-only)."""

import os
import sys

import numpy as np
import pytest

from medplib_tpu.eval import seg_metrics, vqa_metrics

REF_EVAL = "/root/reference/model/eval"


@pytest.fixture(scope="module")
def ref_eval():
    if not os.path.isdir(REF_EVAL):
        pytest.skip("reference not available")
    sys.path.insert(0, REF_EVAL)
    import evaluate_metrics
    import glossary
    yield evaluate_metrics, glossary
    sys.path.remove(REF_EVAL)


CASES = [
    ("the lung is on the left", "lung on left side"),
    ("yes", "yes"),
    ("No, it isn't.", "no"),
    ("Two lesions are visible", "2 lesions visible"),
    ("a CT scan of the brain...", "ct scan of brain"),
    ("", "something"),
]


def test_normalize_word_parity(ref_eval):
    _, glossary = ref_eval
    for cand, _ in CASES:
        assert vqa_metrics.normalize_word(cand) == glossary.normalize_word(
            cand), cand


def test_exact_match_parity(ref_eval):
    eval_utils, _ = ref_eval
    for cand, ref in CASES:
        got = vqa_metrics.calculate_exactmatch(cand, ref)
        want = eval_utils.calculate_exactmatch(cand, ref)
        assert abs(got - want) < 1e-9, (cand, ref, got, want)


def test_f1_parity(ref_eval):
    eval_utils, _ = ref_eval
    for cand, ref in CASES:
        got = vqa_metrics.calculate_f1score(cand, ref)
        want = eval_utils.calculate_f1score(cand, ref)
        assert np.allclose(got, want), (cand, ref, got, want)


def test_candidate_set_parity(ref_eval):
    eval_utils, _ = ref_eval
    cands = {"lung", "heart", "2 lesions visible", "no"}
    for cand, ref in CASES[:5]:
        got = vqa_metrics.calculate_appearance_with_normalization(
            cand, ref, sorted(cands))
        want = eval_utils.calculate_appearance_with_normalization(
            cand, ref, sorted(cands))
        assert got == want, (cand, ref)


def test_evaluate_vqa_table():
    records = [
        {"text": "yes", "gt": "yes", "answer_type": "yes/no"},
        {"text": "no", "gt": "yes", "answer_type": "closed"},
        {"text": "the left lung", "gt": "left lung", "answer_type": "open"},
    ]
    out = vqa_metrics.evaluate_vqa(records)
    assert out["closed_accuracy"] == 50.0
    assert out["num_open"] == 1
    assert out["exact_match_acc"] == 100.0


def test_seg_iou_dice():
    pred = np.full((8, 8), -10.0)
    pred[:4, :4] = 10.0  # sigmoid ~1 in top-left quadrant
    gt = np.zeros((8, 8))
    gt[:4, :8] = 1  # top half
    iou, dice = seg_metrics.sample_iou_dice(pred, gt)
    assert abs(iou - 16 / 32) < 1e-6
    assert abs(dice - 2 * iou / (1 + iou)) < 1e-9


def test_binarize_threshold_point1():
    # logit giving sigmoid ~0.12 must count as foreground (threshold 0.1,
    # vqa_infer.py:565)
    pred = np.full((2, 2), -2.0)  # sigmoid = 0.119
    assert seg_metrics.binarize_logits(pred).all()
    pred = np.full((2, 2), -2.3)  # sigmoid = 0.091
    assert not seg_metrics.binarize_logits(pred).any()


def test_seg_meter_giou_ciou():
    m = seg_metrics.SegMeter()
    a = np.zeros((4, 4)); a[:2] = 1
    b = np.zeros((4, 4)); b[:2, :2] = 1
    m.update(a, a)  # IoU 1
    m.update(b, a)  # IoU 0.5
    res = m.results()
    assert abs(res["giou"] - 0.75) < 1e-6
    # cIoU: total inter 8+4, total union 8+8
    assert abs(res["ciou"] - 12 / 16) < 1e-6


def test_modality_prefix():
    assert seg_metrics.modality_of("/data/ct_00123.png") == "ct"
    assert seg_metrics.modality_of("x_ray_5.png") == "x_ray"
    assert seg_metrics.modality_of(None) == "unknown"
