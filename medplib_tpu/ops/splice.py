"""Multimodal token splice as batched static-shape gathers.

The reference's `prepare_inputs_labels_for_multimodal`
(/root/reference/model/medplib/model/medplib_arch.py:217-527) walks every
sequence in Python, splitting on IMAGE_TOKEN_INDEX / REGION_TOKEN_INDEX
sentinels and concatenating ragged embedding chunks — hot loop (b) in
SURVEY.md §3. Here the same semantics compile to a handful of vectorized ops:

  1. each input token expands to `exp_len` output slots (image sentinel ->
     that image's token count, everything else -> 1; padding -> 0)
  2. an exclusive cumsum gives each token's output start; a searchsorted
     recovers, for every output slot, its source token and within-span offset
  3. one gather per source kind (text embedding / image feature buffer /
     region feature) + a select assembles the output embeddings

Output length is a static `out_len` (sequence-bucketed upstream), so the
whole thing jits once and runs for any mix of images, regions, and ICL
(image, mask) example counts.

Semantics preserved from the reference:
  - image spans get IGNORE_INDEX labels and keep attention (442-527)
  - region sentinel consumes one slot, replaced by a region feature
  - seg-token mask marks the slot whose NEXT token is <SEG>, expanded through
    image spans (MedPLIB.py:310-355 `build_seg_token_mask`)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from medplib_tpu.config import (IGNORE_INDEX, IMAGE_TOKEN_INDEX,
                                REGION_TOKEN_INDEX)


class SpliceMap(NamedTuple):
    src_idx: jnp.ndarray        # [B, T_out] source input-token index
    within: jnp.ndarray         # [B, T_out] offset within that token's span
    is_image: jnp.ndarray       # [B, T_out] slot takes an image feature
    is_region: jnp.ndarray      # [B, T_out] slot takes a region feature
    image_flat_idx: jnp.ndarray  # [B, T_out] row into the image feature buffer
    region_ordinal: jnp.ndarray  # [B, T_out] which region feature
    attn_mask: jnp.ndarray      # [B, T_out] 1 = real slot
    total_len: jnp.ndarray      # [B]


def _exclusive_cumsum(x, axis=-1):
    c = jnp.cumsum(x, axis=axis)
    return c - x


def compute_splice_map(
    input_ids: jnp.ndarray,          # [B, T_in] with sentinel ids
    input_mask: jnp.ndarray,         # [B, T_in] 1 = real token
    image_token_lengths: jnp.ndarray,  # [B, MAX_IMG] tokens per image (0 pad)
    out_len: int,
    image_feat_starts: Optional[jnp.ndarray] = None,  # [B, MAX_IMG] row of
    # image i's first feature in the buffer; default = dense packing
) -> SpliceMap:
    b, t_in = input_ids.shape
    is_img_tok = input_ids == IMAGE_TOKEN_INDEX
    img_ordinal = _exclusive_cumsum(is_img_tok.astype(jnp.int32))
    per_tok_img_len = jnp.take_along_axis(
        image_token_lengths, jnp.clip(img_ordinal, 0,
                                      image_token_lengths.shape[1] - 1),
        axis=1)
    exp_len = jnp.where(is_img_tok, per_tok_img_len, 1)
    exp_len = exp_len * input_mask.astype(jnp.int32)
    start = _exclusive_cumsum(exp_len)
    total = start[:, -1] + exp_len[:, -1]

    out_pos = jnp.arange(out_len)[None, :]  # [1, T_out]
    # src token for each output slot: last token whose start <= j AND that has
    # nonzero length. searchsorted(right) over starts handles zero-length
    # (padding) tokens because their start equals the next real start.
    src_idx = jax.vmap(
        lambda s, j: jnp.searchsorted(s, j, side="right") - 1)(
        start, jnp.broadcast_to(out_pos, (b, out_len)))
    src_idx = jnp.clip(src_idx, 0, t_in - 1)
    within = out_pos - jnp.take_along_axis(start, src_idx, axis=1)

    src_ids = jnp.take_along_axis(input_ids, src_idx, axis=1)
    valid = out_pos < total[:, None]
    is_image = (src_ids == IMAGE_TOKEN_INDEX) & valid
    is_region = (src_ids == REGION_TOKEN_INDEX) & valid

    # flat index into the per-sample image feature buffer: features for image
    # i start at cumsum(image_token_lengths)[:i] (dense packing) or at
    # caller-provided offsets (padded per-slot layout)
    if image_feat_starts is None:
        img_feat_start = _exclusive_cumsum(image_token_lengths)
    else:
        img_feat_start = image_feat_starts
    src_img_ordinal = jnp.take_along_axis(img_ordinal, src_idx, axis=1)
    src_img_ordinal = jnp.clip(src_img_ordinal, 0,
                               image_token_lengths.shape[1] - 1)
    image_flat_idx = jnp.take_along_axis(img_feat_start, src_img_ordinal,
                                         axis=1) + within

    region_tok = (input_ids == REGION_TOKEN_INDEX)
    region_ord_per_tok = _exclusive_cumsum(region_tok.astype(jnp.int32))
    region_ordinal = jnp.take_along_axis(region_ord_per_tok, src_idx, axis=1)

    return SpliceMap(
        src_idx=src_idx, within=within, is_image=is_image,
        is_region=is_region,
        image_flat_idx=jnp.clip(image_flat_idx, 0, None),
        region_ordinal=region_ordinal,
        attn_mask=valid.astype(jnp.int32), total_len=total)


def splice_embeddings(
    sm: SpliceMap,
    input_ids: jnp.ndarray,
    token_embeds: jnp.ndarray,        # [B, T_in, H] (sentinels clamped to 0)
    image_features: jnp.ndarray,      # [B, MAX_FEAT, H] flat per-sample buffer
    region_features: Optional[jnp.ndarray] = None,  # [B, MAX_REG, H]
    labels: Optional[jnp.ndarray] = None,           # [B, T_in]
    seg_token_idx: Optional[int] = None,
):
    """-> (embeds [B, T_out, H], labels_out|None, seg_mask [B, T_out])."""
    b, t_out = sm.src_idx.shape
    h = token_embeds.shape[-1]

    text = jnp.take_along_axis(token_embeds, sm.src_idx[..., None], axis=1)
    img = jnp.take_along_axis(
        image_features,
        jnp.clip(sm.image_flat_idx, 0, image_features.shape[1] - 1)[..., None],
        axis=1)
    out = jnp.where(sm.is_image[..., None], img.astype(text.dtype), text)
    if region_features is not None:
        reg = jnp.take_along_axis(
            region_features,
            jnp.clip(sm.region_ordinal, 0,
                     region_features.shape[1] - 1)[..., None], axis=1)
        out = jnp.where(sm.is_region[..., None], reg.astype(out.dtype), out)
    out = out * sm.attn_mask[..., None].astype(out.dtype)

    labels_out = None
    if labels is not None:
        lab = jnp.take_along_axis(labels, sm.src_idx, axis=1)
        text_slot = (~sm.is_image) & (~sm.is_region) & (sm.attn_mask > 0)
        labels_out = jnp.where(text_slot & (sm.within == 0), lab, IGNORE_INDEX)

    seg_mask = None
    if seg_token_idx is not None:
        # mark source tokens whose NEXT token is <SEG> (MedPLIB.py:322-325)
        next_ids = jnp.concatenate(
            [input_ids[:, 1:], jnp.zeros_like(input_ids[:, :1])], axis=1)
        seg_src = next_ids == seg_token_idx
        seg_here = jnp.take_along_axis(seg_src, sm.src_idx, axis=1)
        text_slot = (~sm.is_image) & (sm.attn_mask > 0) & (sm.within == 0)
        seg_mask = seg_here & text_slot

    return out, labels_out, seg_mask


def gather_seg_embeddings(hidden: jnp.ndarray, seg_mask: jnp.ndarray,
                          max_segs: int):
    """First `max_segs` SEG-marked hidden states per row, in sequence order.

    hidden: [B, T, H]; seg_mask: [B, T] bool -> (embeds [B, S, H],
    valid [B, S]). Replaces the reference's boolean-mask gather
    `last_hidden_state[seg_token_mask]` (MedPLIB.py:460) with a static-shape
    top-k gather.
    """
    b, t, h = hidden.shape
    pos = jnp.arange(t)[None, :]
    score = jnp.where(seg_mask, -pos, -t - 1)  # earlier position = higher
    _, idx = jax.lax.top_k(score, max_segs)    # [B, S] ascending positions
    valid = jnp.take_along_axis(seg_mask, idx, axis=1)
    emb = jnp.take_along_axis(hidden, idx[..., None], axis=1)
    return emb, valid, idx
