"""Multimodal splice: batched gather vs a straight-line loop reference that
mirrors the reference semantics (medplib_arch.py:217-527, MedPLIB.py:310-355)."""

import jax.numpy as jnp
import numpy as np

from medplib_tpu.config import IGNORE_INDEX, IMAGE_TOKEN_INDEX, REGION_TOKEN_INDEX
from medplib_tpu.ops import splice as sp


def _loop_splice(ids, mask, img_lens, tok_emb, img_buf, img_starts, reg_feats,
                 labels, seg_idx, out_len):
    """Per-sample python splice implementing the reference contract."""
    B, T = ids.shape
    H = tok_emb.shape[-1]
    emb = np.zeros((B, out_len, H), np.float32)
    lab = np.full((B, out_len), IGNORE_INDEX, np.int64)
    att = np.zeros((B, out_len), np.int32)
    seg = np.zeros((B, out_len), bool)
    for b in range(B):
        j = 0
        img_i = 0
        reg_i = 0
        for t in range(T):
            if not mask[b, t]:
                continue
            if ids[b, t] == IMAGE_TOKEN_INDEX:
                L = img_lens[b, img_i]
                emb[b, j:j + L] = img_buf[b, img_starts[b, img_i]:
                                          img_starts[b, img_i] + L]
                att[b, j:j + L] = 1
                j += L
                img_i += 1
            elif ids[b, t] == REGION_TOKEN_INDEX:
                emb[b, j] = reg_feats[b, reg_i]
                att[b, j] = 1
                reg_i += 1
                j += 1
            else:
                emb[b, j] = tok_emb[b, t]
                lab[b, j] = labels[b, t]
                att[b, j] = 1
                if t + 1 < T and ids[b, t + 1] == seg_idx:
                    seg[b, j] = True
                j += 1
    return emb, lab, att, seg


def test_splice_matches_loop_reference():
    rng = np.random.default_rng(0)
    B, T, H, L_IMG, SEG = 3, 10, 8, 4, 99
    ids = rng.integers(3, 50, size=(B, T))
    ids[0, 2] = IMAGE_TOKEN_INDEX
    ids[0, 6] = SEG
    ids[1, 0] = IMAGE_TOKEN_INDEX
    ids[1, 4] = REGION_TOKEN_INDEX
    ids[2, 1] = IMAGE_TOKEN_INDEX
    ids[2, 5] = IMAGE_TOKEN_INDEX  # two images
    mask = np.ones((B, T), np.int32)
    mask[0, 8:] = 0  # padded tail
    ids[0, 8:] = 0
    labels = rng.integers(3, 50, size=(B, T))
    img_lens = np.array([[L_IMG, 0], [L_IMG, 0], [L_IMG, L_IMG]], np.int32)
    img_starts = np.array([[0, L_IMG]] * B, np.int32)
    img_buf = rng.normal(size=(B, 2 * L_IMG, H)).astype(np.float32)
    reg = rng.normal(size=(B, 2, H)).astype(np.float32)
    tok_emb = rng.normal(size=(B, T, H)).astype(np.float32)
    out_len = T + 2 * (L_IMG - 1)

    smap = sp.compute_splice_map(jnp.asarray(ids), jnp.asarray(mask),
                                 jnp.asarray(img_lens), out_len,
                                 image_feat_starts=jnp.asarray(img_starts))
    emb, lab, seg = sp.splice_embeddings(
        smap, jnp.asarray(ids), jnp.asarray(tok_emb), jnp.asarray(img_buf),
        region_features=jnp.asarray(reg), labels=jnp.asarray(labels),
        seg_token_idx=SEG)

    w_emb, w_lab, w_att, w_seg = _loop_splice(
        ids, mask, img_lens, tok_emb, img_buf, img_starts, reg, labels, SEG,
        out_len)
    np.testing.assert_allclose(np.asarray(emb), w_emb, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(lab), w_lab)
    np.testing.assert_array_equal(np.asarray(smap.attn_mask), w_att)
    np.testing.assert_array_equal(np.asarray(seg), w_seg)


def test_gather_seg_embeddings_order_and_validity():
    rng = np.random.default_rng(1)
    B, T, H = 2, 9, 4
    hidden = rng.normal(size=(B, T, H)).astype(np.float32)
    seg = np.zeros((B, T), bool)
    seg[0, 3] = seg[0, 7] = True  # two SEGs
    # row 1: none
    emb, valid, idx = sp.gather_seg_embeddings(jnp.asarray(hidden),
                                               jnp.asarray(seg), 2)
    assert valid.tolist() == [[True, True], [False, False]]
    np.testing.assert_allclose(np.asarray(emb)[0, 0], hidden[0, 3])
    np.testing.assert_allclose(np.asarray(emb)[0, 1], hidden[0, 7])
    assert idx.tolist()[0] == [3, 7]
