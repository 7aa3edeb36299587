"""MedPLIB composite model: CLIP -> (MoE-)LLaMA -> SAM-Med2D.

Rebuild of /root/reference/model/MedPLIB.py (MedPLIBForCausalLM) and
model/LISA.py (the dense variant is this model with cfg.moe.enable=False),
TPU-first. The reference's Python hot loops (SURVEY.md §3.1 hot-loop list)
become batched XLA:

  (a) per-image SAM encoder loop (MedPLIB.py:277-282)  -> one batched encode
  (b) per-token multimodal splice (medplib_arch.py)    -> ops/splice.py gathers
  (e) per-SEG-token prompt/mask-decoder loop (473-502) -> one batched decode

Everything here is jit-compatible with static shapes: the collator provides
fixed [B, T_in] token buffers, MAX_IMG image slots, MAX_REG region slots and
MAX_SEG mask slots with validity flags.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from medplib_tpu.config import MedplibConfig
from medplib_tpu.models import (clip, geo_sampler, llama, losses, moe_llama,
                                projector, sam_med2d)
from medplib_tpu.ops import splice as splice_ops
from medplib_tpu.ops.initializers import dense_init

Params = Dict[str, Any]


class Batch(NamedTuple):
    """Static-shape training/eval batch (collator contract, mirrors
    DataCollatorForSupervisedDataset.py:11-138)."""

    input_ids: jnp.ndarray        # [B, T_in] with sentinel ids
    input_mask: jnp.ndarray       # [B, T_in]
    labels: jnp.ndarray           # [B, T_in] (IGNORE_INDEX outside targets)
    images_clip: jnp.ndarray      # [B, MAX_IMG, S, S, 3] CLIP-preprocessed
    images_sam: jnp.ndarray       # [B, S', S', 3] SAM-preprocessed pixels
    image_token_lengths: jnp.ndarray  # [B, MAX_IMG] (0 = unused slot)
    image_is_mask: jnp.ndarray    # [B, MAX_IMG] ICL mask-encoder slots
    mask_images: jnp.ndarray      # [B, MAX_IMG, Sm, Sm] ICL example masks
    region_masks: jnp.ndarray     # [B, MAX_REG, 24, 24]
    region_valid: jnp.ndarray     # [B, MAX_REG]
    gt_masks: jnp.ndarray         # [B, MAX_SEG, Hm, Wm] (SAM frame)
    mask_valid: jnp.ndarray       # [B, MAX_SEG]

    @staticmethod
    def make(input_ids, input_mask, labels, images_clip, images_sam,
             image_token_lengths, *, image_is_mask=None, mask_images=None,
             region_masks=None, region_valid=None, gt_masks=None,
             mask_valid=None, mask_size=256, sam_frame=256):
        b = input_ids.shape[0]
        max_img = image_token_lengths.shape[1]
        z = jnp.zeros
        return Batch(
            input_ids=input_ids, input_mask=input_mask, labels=labels,
            images_clip=images_clip, images_sam=images_sam,
            image_token_lengths=image_token_lengths,
            image_is_mask=(image_is_mask if image_is_mask is not None
                           else z((b, max_img), jnp.int32)),
            mask_images=(mask_images if mask_images is not None
                         else z((b, max_img, mask_size, mask_size))),
            region_masks=(region_masks if region_masks is not None
                          else z((b, 1, 24, 24))),
            region_valid=(region_valid if region_valid is not None
                          else z((b, 1), bool)),
            gt_masks=(gt_masks if gt_masks is not None
                      else z((b, 1, sam_frame, sam_frame))),
            mask_valid=(mask_valid if mask_valid is not None
                        else z((b, 1), bool)),
        )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_medplib(key, cfg: MedplibConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    h = cfg.llm.hidden_size
    if cfg.moe.enable:
        llm = moe_llama.init_moe_llama(ks[0], cfg.llm, cfg.moe, dtype,
                                       cfg.vocab_size_padded)
    else:
        llm = llama.init_llama(ks[0], cfg.llm, dtype, cfg.vocab_size_padded)
    params = {
        "llm": llm,
        "clip": clip.init_clip_vision(ks[1], cfg.vision, dtype),
        "mm_projector": projector.init_projector(ks[2], cfg.projector, dtype),
        "region_fea_adapter": projector.init_region_adapter(
            ks[3], cfg.projector.mm_hidden_size, h, dtype),
        # SAM inherits the model dtype: on TPU the frozen tower runs fine in
        # bf16 (2x HBM traffic saved, MXU-native); weight translation from
        # the released f32 .pth goes through hf_weights.cast_tree instead
        "sam": sam_med2d.init_sam(ks[4], cfg.sam, dtype),
        # text_hidden_fcs: Linear(h,h) -> ReLU -> Linear(h,out) -> Dropout(0)
        # (MedPLIB.py:152-160)
        "text_hidden_fcs": {
            "fc1": {"kernel": dense_init(ks[5], h, h, dtype),
                    "bias": jnp.zeros((h,), dtype)},
            "fc2": {"kernel": dense_init(ks[6], h, cfg.seg.out_dim, dtype),
                    "bias": jnp.zeros((cfg.seg.out_dim,), dtype)},
        },
    }
    if cfg.projector.token_compress:
        params["mm_token_compressor"] = projector.init_token_compressor(
            ks[7], h, dtype)
    if cfg.projector.mask_encoder:
        params["mask_encoder"] = projector.init_mask_encoder(ks[7], h, dtype)
    if cfg.projector.region_geo_sampler:
        params["region_geo_sampler"] = geo_sampler.init_geo_sampler(
            ks[7], cfg.projector.mm_hidden_size, h, dtype=dtype)
    return params


def text_hidden_fcs(p: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    x = hidden @ p["fc1"]["kernel"] + p["fc1"]["bias"]
    x = jax.nn.relu(x)
    return x @ p["fc2"]["kernel"] + p["fc2"]["bias"]


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def image_tokens_per_image(cfg: MedplibConfig) -> int:
    if cfg.projector.token_compress:
        return cfg.projector.compress_tokens
    return cfg.vision.num_patches


def encode_images(params: Params, cfg: MedplibConfig,
                  images_clip: jnp.ndarray, image_is_mask: jnp.ndarray,
                  mask_images: jnp.ndarray, need_region: bool):
    """images_clip: [B, MAX_IMG, S, S, 3] -> feature buffer [B, MAX_IMG*Lmax,
    H] plus the raw CLIP patch features of image slot 0 (region pooling
    source, medplib_arch.py:198-212)."""
    b, n_img = images_clip.shape[:2]
    flat = images_clip.reshape((b * n_img,) + images_clip.shape[2:])
    raw = clip.forward_features(params["clip"], flat, cfg.vision)
    raw = jax.lax.stop_gradient(raw)  # frozen tower (clip_encoder.py:28)
    proj = projector.apply_projector(params["mm_projector"], raw)
    if cfg.projector.token_compress:
        proj = projector.apply_token_compressor(
            params["mm_token_compressor"], proj,
            cfg.projector.compress_tokens)
    l_img = proj.shape[1]

    if cfg.projector.mask_encoder:
        mflat = mask_images.reshape((b * n_img,) + mask_images.shape[2:])
        mask_feats = projector.apply_mask_encoder(
            params["mask_encoder"], mflat, cfg.projector.mask_encoder_tokens)
        l_max = max(l_img, cfg.projector.mask_encoder_tokens)
        proj = jnp.pad(proj, ((0, 0), (0, l_max - proj.shape[1]), (0, 0)))
        mask_feats = jnp.pad(
            mask_feats, ((0, 0), (0, l_max - mask_feats.shape[1]), (0, 0)))
        sel = image_is_mask.reshape(b * n_img, 1, 1).astype(bool)
        feats = jnp.where(sel, mask_feats, proj)
    else:
        l_max = l_img
        feats = proj

    buffer = feats.reshape(b, n_img * l_max, -1)
    region_fmap = None
    if need_region:
        raw0 = raw.reshape(b, n_img, raw.shape[1], raw.shape[2])[:, 0]
        if cfg.projector.region_geo_sampler:
            # geo sampler consumes RAW clip features (medplib_arch.py:205-207)
            region_fmap = raw0
        else:
            region_fmap = projector.apply_region_adapter(
                params["region_fea_adapter"], raw0)
    return buffer, l_max, region_fmap


def splice_batch(params: Params, cfg: MedplibConfig, batch: Batch,
                 need_region: bool):
    """Full multimodal input prep -> (embeds, labels, attn, seg_mask)."""
    buffer, l_max, region_fmap = encode_images(
        params, cfg, batch.images_clip, batch.image_is_mask,
        batch.mask_images, need_region)
    # feature rows for image i start at i * l_max (padded layout)
    n_img = batch.images_clip.shape[1]
    starts = (jnp.arange(n_img) * l_max)[None, :].astype(jnp.int32)
    sm = splice_ops.compute_splice_map(
        batch.input_ids, batch.input_mask, batch.image_token_lengths,
        out_len=_out_len(cfg, batch), image_feat_starts=jnp.broadcast_to(
            starts, batch.image_token_lengths.shape))

    region_feats = None
    if need_region:
        if cfg.projector.region_geo_sampler:
            region_feats = geo_sampler.apply_geo_sampler(
                params["region_geo_sampler"], region_fmap,
                batch.region_masks, batch.region_valid,
                pooler_mode=cfg.projector.sampler_pooler_mode)
        else:
            region_feats = projector.region_pool(
                region_fmap, batch.region_masks, batch.region_valid)

    token_embeds = llama.embed(params["llm"], batch.input_ids)
    embeds, labels_out, seg_mask = splice_ops.splice_embeddings(
        sm, batch.input_ids, token_embeds, buffer,
        region_features=region_feats, labels=batch.labels,
        seg_token_idx=cfg.seg_token_idx)
    return embeds, labels_out, sm.attn_mask, seg_mask, sm


def _out_len(cfg: MedplibConfig, batch: Batch) -> int:
    """Static spliced length: T_in + MAX_IMG * (tokens-per-image or mask
    tokens, whichever larger) - MAX_IMG sentinel slots."""
    per = image_tokens_per_image(cfg)
    if cfg.projector.mask_encoder:
        per = max(per, cfg.projector.mask_encoder_tokens)
    n_img = batch.image_token_lengths.shape[1]
    return batch.input_ids.shape[1] + n_img * (per - 1)


# ---------------------------------------------------------------------------
# LLM dispatch (dense vs MoE)
# ---------------------------------------------------------------------------

def _llm_forward(params, cfg: MedplibConfig, embeds, attn_mask, cache=None,
                 train=True, remat=False, ep_shard=False, unroll=False):
    if cfg.moe.enable:
        return moe_llama.forward(params["llm"], cfg.llm, cfg.moe, embeds,
                                 attn_mask, cache=cache, remat=remat,
                                 train=train, ep_shard=ep_shard,
                                 unroll=unroll)
    return llama.forward(params["llm"], cfg.llm, embeds, attn_mask,
                         cache=cache, remat=remat, unroll=unroll)


def _llm_decode(params, cfg: MedplibConfig, embeds, cache, ep_shard=False,
                unroll=False):
    if cfg.moe.enable:
        return moe_llama.forward_decode(params["llm"], cfg.llm, cfg.moe,
                                        embeds, cache, ep_shard=ep_shard,
                                        unroll=unroll)
    return llama.forward_decode(params["llm"], cfg.llm, embeds, cache,
                                unroll=unroll)


# ---------------------------------------------------------------------------
# seg decode head (batched over every SEG slot in the batch)
# ---------------------------------------------------------------------------

def decode_seg_masks(params: Params, cfg: MedplibConfig,
                     sam_embeddings: jnp.ndarray, seg_embeds: jnp.ndarray,
                     out_size: Optional[int] = None):
    """sam_embeddings: [B, h, w, D]; seg_embeds: [B, S, out_dim]
    -> (mask logits [B, S, out, out], iou [B, S])."""
    b, s, d = seg_embeds.shape
    text = seg_embeds.reshape(b * s, 1, d)
    sparse, dense = sam_med2d.encode_prompts(
        params["sam"]["prompt_encoder"], cfg.sam, b * s, text_embeds=text)
    img = jnp.repeat(sam_embeddings, s, axis=0)
    pe = sam_med2d.dense_pe(params["sam"]["prompt_encoder"], cfg.sam)
    low_res, iou = sam_med2d.decode_masks(
        params["sam"]["mask_decoder"], cfg.sam, img, pe, sparse, dense,
        multimask_output=False)
    if out_size is None:
        out_size = cfg.sam.image_size
    masks = sam_med2d.postprocess_masks(low_res, out_size)
    return (masks.reshape(b, s, out_size, out_size),
            iou.reshape(b, s))


# ---------------------------------------------------------------------------
# training forward (model_forward, MedPLIB.py:364-572)
# ---------------------------------------------------------------------------

def model_forward(params: Params, cfg: MedplibConfig, batch: Batch,
                  train: bool = True, seg_flag: bool = True,
                  rp_flag: bool = False, remat: bool = True,
                  ep_shard: bool = False, max_segs: Optional[int] = None):
    embeds, labels_out, attn_mask, seg_mask, _ = splice_batch(
        params, cfg, batch, need_region=rp_flag)
    hidden, _, aux = _llm_forward(params, cfg, embeds, attn_mask,
                                  train=train, remat=remat,
                                  ep_shard=ep_shard)
    logits = llama.logits(params["llm"], hidden)

    ce = losses.cross_entropy_loss(logits, labels_out) * cfg.seg.ce_loss_weight
    if cfg.moe.enable:
        ce = ce + cfg.moe.router_aux_loss_coef * aux

    out = {"ce_loss": ce}
    if not seg_flag:
        zero = jnp.zeros((), jnp.float32)
        out.update(loss=ce, mask_bce_loss=zero, mask_dice_loss=zero,
                   mask_loss=zero)
        return out

    sam_emb = jax.lax.stop_gradient(sam_med2d.encode_image(
        params["sam"]["image_encoder"], batch.images_sam, cfg.sam))

    s_max = max_segs or batch.gt_masks.shape[1]
    proj_hidden = text_hidden_fcs(params["text_hidden_fcs"], hidden)
    seg_embeds, seg_valid, _ = splice_ops.gather_seg_embeddings(
        proj_hidden, seg_mask, s_max)

    out_size = batch.gt_masks.shape[-1]
    pred_masks, pred_iou = decode_seg_masks(params, cfg, sam_emb, seg_embeds,
                                            out_size)

    valid = (seg_valid & batch.mask_valid).reshape(-1)
    pm = pred_masks.reshape((-1,) + pred_masks.shape[2:])
    gm = batch.gt_masks.reshape((-1,) + batch.gt_masks.shape[2:])

    bce = losses.sigmoid_ce_loss(pm, gm, valid)
    dice = losses.dice_loss(pm, gm, valid)
    iou_l = losses.mask_iou_loss(pm, gm, pred_iou.reshape(-1), valid)
    focal = losses.focal_loss(pm, gm, valid)

    mask_loss = (cfg.seg.bce_loss_weight * bce +
                 cfg.seg.dice_loss_weight * dice +
                 cfg.seg.iou_loss_weight * iou_l +
                 cfg.seg.focal_loss_weight * focal)
    out.update(
        loss=ce + mask_loss,
        mask_bce_loss=cfg.seg.bce_loss_weight * bce,
        mask_dice_loss=cfg.seg.dice_loss_weight * dice,
        mask_loss=mask_loss,
        unscale_mask_bce_loss=bce, unscale_mask_dice_loss=dice,
        unscale_mask_iou_loss=iou_l, unscale_mask_focal_loss=focal,
    )
    if not train:
        out["pred_masks"] = pred_masks
        out["seg_valid"] = seg_valid
    return out


# ---------------------------------------------------------------------------
# generation (evaluate, MedPLIB.py:574-680): decode with SEG-position
# hidden-state capture INSIDE the loop (vs the reference's post-hoc concat of
# per-step hidden states, 608-610). Supports greedy and temperature/top-p
# sampling (model_worker.py:420-425) and captures up to `max_segs` SEG tokens
# per row (model_forward decodes a mask per SEG slot, MedPLIB.py:473-502;
# evaluate() keeps the first, 639-641 — max_segs=1 reproduces that).
# ---------------------------------------------------------------------------

class GenerateResult(NamedTuple):
    output_ids: jnp.ndarray   # [B, MAX_NEW] generated tokens (pad after EOS)
    num_generated: jnp.ndarray  # [B]
    pred_masks: jnp.ndarray   # [B, S, out, out] mask logits per SEG slot
    seg_valid: jnp.ndarray    # [B, S] slot holds a real SEG capture
    has_seg: jnp.ndarray      # [B] bool (any SEG; slot 0 else holds fallback)


def _seg_slot_write(seg_emb: jnp.ndarray, seg_count: jnp.ndarray,
                    cap: jnp.ndarray, is_seg: jnp.ndarray):
    """Write cap [B,D] into seg_emb [B,S,D] at each row's next free slot
    where is_seg; returns updated (seg_emb, seg_count)."""
    s = seg_emb.shape[1]
    can = is_seg & (seg_count < s)
    slot = jax.nn.one_hot(seg_count, s, dtype=bool) & can[:, None]
    seg_emb = jnp.where(slot[..., None], cap[:, None, :].astype(seg_emb.dtype),
                        seg_emb)
    return seg_emb, seg_count + can.astype(seg_count.dtype)


def _make_decode_step(params, cfg: MedplibConfig, eos_id: int,
                      do_sample: bool, temperature, top_p,
                      ep_shard: bool = False, unroll: bool = False):
    """Scan body shared by generate() and stream_decode_chunk().

    carry = (cache, tok, done, seg_emb [B,S,D], seg_count [B],
             last_cap [B,D], rng). SEG emitted now -> capture THIS step's
    hidden state: the reference indexes the concatenated per-step states with
    the shifted mask output_ids[:, 1:] == seg_token_idx (MedPLIB.py:615-625),
    i.e. the state of the forward pass that predicted SEG.
    """
    from medplib_tpu.ops import sampling

    def step(carry, _):
        cache, tok, done, seg_emb, seg_count, last_cap, key = carry
        emb = llama.embed(params["llm"], tok[:, None])
        hidden, cache = _llm_decode(params, cfg, emb, cache,
                                    ep_shard=ep_shard, unroll=unroll)
        logits = llama.logits(params["llm"], hidden)[:, 0]
        if do_sample:
            key, sub = sampling.split_rows(key)
            new_tok = sampling.sample_token(sub, logits, temperature, top_p)
            new_tok = new_tok.astype(tok.dtype)
        else:
            new_tok = jnp.argmax(logits, -1).astype(tok.dtype)
        is_seg = (new_tok == cfg.seg_token_idx) & (~done)
        cap = text_hidden_fcs(params["text_hidden_fcs"], hidden)[:, 0]
        seg_emb, seg_count = _seg_slot_write(seg_emb, seg_count, cap, is_seg)
        last_cap = jnp.where(done[:, None], last_cap,
                             cap.astype(last_cap.dtype))
        new_tok = jnp.where(done, 0, new_tok)
        new_done = done | (new_tok == eos_id)
        return ((cache, new_tok, new_done, seg_emb, seg_count, last_cap, key),
                (tok, done))

    return step


def generate(params: Params, cfg: MedplibConfig, batch: Batch,
             max_new_tokens: int = 64, eos_id: int = 2,
             rp_flag: bool = False, out_size: Optional[int] = None,
             ep_shard: bool = False,
             unroll_layers: bool = False,
             ground: bool = True,
             max_segs: int = 1,
             do_sample: bool = False, temperature=1.0, top_p=1.0,
             rng: Optional[jax.Array] = None,
             kv_quant: bool = False) -> GenerateResult:
    """Decode + pixel grounding, fully jit-able.

    Reproduces model.evaluate(): generate with hidden-state harvesting, find
    <SEG> tokens in the output (prompt SEGs first, then generated, up to
    `max_segs`), decode each captured hidden state through text_hidden_fcs ->
    SAM, batched over slots. Fallback when no SEG anywhere: the last decode
    step's projected hidden in slot 0 (MedPLIB.py:642-644). `do_sample`
    enables temperature/top-p sampling (traced scalars, one program for any
    value; model_worker.py:420-425) — greedy compiles with no sampling ops.
    """
    b = batch.input_ids.shape[0]
    embeds, _, attn_mask, seg_mask_prompt, _ = splice_batch(
        params, cfg, batch, need_region=rp_flag)
    t_out = embeds.shape[1]
    max_len = t_out + max_new_tokens

    # kv_quant: int8 cache with per-token-per-head scales (llama.KVCache)
    cache = llama.KVCache.init(cfg.llm, b, max_len,
                               dtype=embeds.dtype, quant=kv_quant)
    hidden, cache, _ = _llm_forward(params, cfg, embeds, attn_mask,
                                    cache=cache, train=False,
                                    ep_shard=ep_shard, unroll=unroll_layers)
    # hidden state of the LAST real token per row predicts the first new one
    last_idx = jnp.maximum(jnp.sum(attn_mask, -1) - 1, 0)
    last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None],
                                      axis=1)  # [B, 1, H]
    from medplib_tpu.ops import sampling
    # per-ROW RNG streams [B, 2]: each row's sample stream depends only on
    # its own seed, so batching requests together (serve/engine.py) cannot
    # perturb a seeded request's tokens
    key = sampling.row_keys(
        rng if rng is not None else jax.random.PRNGKey(0), b)
    key, sub = sampling.split_rows(key)
    next_tok = sampling.select_token(
        llama.logits(params["llm"], last_hidden)[:, 0], sub, do_sample,
        temperature, top_p)

    # prompt-side SEG capture (SEGs in the prompt, e.g. teacher-forced eval)
    proj_prompt = text_hidden_fcs(params["text_hidden_fcs"], hidden)
    p_emb, p_valid, _ = splice_ops.gather_seg_embeddings(
        proj_prompt, seg_mask_prompt, max_segs)  # valid slots left-packed

    seg_emb = jnp.where(p_valid[..., None], p_emb,
                        jnp.zeros_like(p_emb)).astype(embeds.dtype)
    seg_count = jnp.sum(p_valid, axis=1).astype(jnp.int32)

    # SEG as the FIRST generated token: the predicting state is the
    # prefill's last real-token hidden (the shifted mask's prompt boundary)
    first_cap = text_hidden_fcs(params["text_hidden_fcs"], last_hidden)[:, 0]
    first_seg = next_tok == cfg.seg_token_idx
    seg_emb, seg_count = _seg_slot_write(seg_emb, seg_count, first_cap,
                                         first_seg)

    step = _make_decode_step(params, cfg, eos_id, do_sample, temperature,
                             top_p, ep_shard=ep_shard, unroll=unroll_layers)
    carry = (cache, next_tok, jnp.zeros((b,), bool), seg_emb, seg_count,
             first_cap.astype(seg_emb.dtype), key)
    carry, (toks, dones) = jax.lax.scan(step, carry, None,
                                        length=max_new_tokens)
    _, _, _, seg_emb, seg_count, last_cap, _ = carry
    output_ids = jnp.moveaxis(toks, 0, 1)  # [B, MAX_NEW]
    num_generated = jnp.sum(~jnp.moveaxis(dones, 0, 1), axis=1)

    # fallback when no SEG anywhere: last projected hidden in slot 0
    has_seg = seg_count > 0
    seg_emb = seg_emb.at[:, 0].set(
        jnp.where(has_seg[:, None], seg_emb[:, 0],
                  last_cap.astype(seg_emb.dtype)))
    seg_valid = jnp.arange(max_segs)[None, :] < seg_count[:, None]

    if ground:
        sam_emb = sam_med2d.encode_image(params["sam"]["image_encoder"],
                                         batch.images_sam, cfg.sam)
        pred, _ = decode_seg_masks(params, cfg, sam_emb, seg_emb,
                                   out_size or cfg.sam.image_size)
    else:  # pure-VQA: skip the SAM forward entirely
        o = out_size or cfg.sam.image_size
        pred = jnp.zeros((b, max_segs, o, o), jnp.float32)
    return GenerateResult(output_ids=output_ids, num_generated=num_generated,
                          pred_masks=pred, seg_valid=seg_valid,
                          has_seg=has_seg)


# ---------------------------------------------------------------------------
# streaming generation (serving): prefill once, decode in jitted chunks so
# text can stream to the client mid-generation (the reference worker's
# token-by-token loop, model_worker.py:393-427, amortized over chunks)
# ---------------------------------------------------------------------------

class StreamState(NamedTuple):
    cache: Any                # llama.KVCache
    tok: jnp.ndarray          # [B] next input token
    done: jnp.ndarray         # [B] bool
    seg_emb: jnp.ndarray      # [B, S, out_dim] captured SEG slots
    seg_count: jnp.ndarray    # [B] number of filled slots
    last_cap: jnp.ndarray     # [B, out_dim] latest projected hidden (fallback)
    rng: jnp.ndarray          # [B, 2] per-row PRNG streams for sampling

    @property
    def seg_found(self):
        return self.seg_count > 0


def stream_prefill(params: Params, cfg: MedplibConfig, batch: Batch,
                   max_new_tokens: int, rp_flag: bool = False,
                   max_segs: int = 1,
                   do_sample: bool = False, temperature=1.0, top_p=1.0,
                   rng: Optional[jax.Array] = None,
                   kv_quant: bool = False,
                   ep_shard: bool = False) -> StreamState:
    """Splice + prefill; returns the carry for stream_decode_chunk. SEG
    capture semantics match generate() (this step's hidden; prompt SEGs and
    first-generated-token SEG included). ep_shard: annotate the MoE
    dispatch for an expert-sharded mesh (multi-chip serving)."""
    from medplib_tpu.ops import sampling

    b = batch.input_ids.shape[0]
    embeds, _, attn_mask, seg_mask_prompt, _ = splice_batch(
        params, cfg, batch, need_region=rp_flag)
    cache = llama.KVCache.init(cfg.llm, b, embeds.shape[1] + max_new_tokens,
                               dtype=embeds.dtype, quant=kv_quant)
    hidden, cache, _ = _llm_forward(params, cfg, embeds, attn_mask,
                                    cache=cache, train=False,
                                    ep_shard=ep_shard)
    last_idx = jnp.maximum(jnp.sum(attn_mask, -1) - 1, 0)
    last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)
    # per-row streams: see generate() — required by the batching engine
    key = sampling.row_keys(
        rng if rng is not None else jax.random.PRNGKey(0), b)
    key, sub = sampling.split_rows(key)
    next_tok = sampling.select_token(
        llama.logits(params["llm"], last_hidden)[:, 0], sub, do_sample,
        temperature, top_p)

    proj_prompt = text_hidden_fcs(params["text_hidden_fcs"], hidden)
    p_emb, p_valid, _ = splice_ops.gather_seg_embeddings(
        proj_prompt, seg_mask_prompt, max_segs)
    seg_emb = jnp.where(p_valid[..., None], p_emb,
                        jnp.zeros_like(p_emb)).astype(embeds.dtype)
    seg_count = jnp.sum(p_valid, axis=1).astype(jnp.int32)

    first_seg = next_tok == cfg.seg_token_idx
    first_cap = text_hidden_fcs(params["text_hidden_fcs"], last_hidden)[:, 0]
    seg_emb, seg_count = _seg_slot_write(seg_emb, seg_count, first_cap,
                                         first_seg)
    return StreamState(cache=cache, tok=next_tok,
                       done=jnp.zeros((b,), bool), seg_emb=seg_emb,
                       seg_count=seg_count,
                       last_cap=first_cap.astype(seg_emb.dtype), rng=key)


def stream_decode_chunk(params: Params, cfg: MedplibConfig,
                        state: StreamState, chunk: int,
                        eos_id: int = 2,
                        do_sample: bool = False, temperature=1.0,
                        top_p=1.0, ep_shard: bool = False):
    """Decode `chunk` tokens from the carried state (greedy, or
    temperature/top-p when do_sample — model_worker.py:420-425).
    -> (new state, tokens [B, chunk], done-before-step [B, chunk])."""
    step = _make_decode_step(params, cfg, eos_id, do_sample, temperature,
                             top_p, ep_shard=ep_shard)
    carry = (state.cache, state.tok, state.done, state.seg_emb,
             state.seg_count, state.last_cap, state.rng)
    carry, (toks, dones) = jax.lax.scan(step, carry, None, length=chunk)
    new_state = StreamState(*carry)
    return new_state, jnp.moveaxis(toks, 0, 1), jnp.moveaxis(dones, 0, 1)


# ---------------------------------------------------------------------------
# CHUNKED prefill (serving): the prompt is prefilled in fixed-size chunks so
# the engine can interleave shared-batch decode chunks between them — one
# admission's ~600-1100-token spliced prefill no longer stalls every
# in-flight stream for its whole length (the loaded-TTFT surface of the
# reference worker, model_worker.py:577-592). Three jit-able pieces:
# begin (splice + empty cache) -> N x chunk (extend) -> finish (first token).
# ---------------------------------------------------------------------------

class PrefillCarry(NamedTuple):
    cache: Any                # llama.KVCache (length stays 0 until finish)
    seg_emb: jnp.ndarray      # [B, S, out_dim] prompt SEG slots so far
    seg_count: jnp.ndarray    # [B]
    last_hidden: jnp.ndarray  # [B, H] hidden at each row's last valid pos


def stream_prefill_begin(params: Params, cfg: MedplibConfig, batch: Batch,
                         max_new_tokens: int, chunk_tokens: int,
                         rp_flag: bool = False, max_segs: int = 1,
                         kv_quant: bool = False,
                         cache_len: Optional[int] = None):
    """Splice the prompt and init an empty cache for chunked prefill ->
    (embeds, attn_mask, seg_mask, carry). embeds/masks are padded up to a
    whole number of chunks (padding queries write garbage K/V past every
    row's true length — never read, decode masks by cache.length)."""
    b = batch.input_ids.shape[0]
    embeds, _, attn_mask, seg_mask, _ = splice_batch(params, cfg, batch,
                                                     need_region=rp_flag)
    n = -(-embeds.shape[1] // chunk_tokens)
    pad = n * chunk_tokens - embeds.shape[1]
    if pad:
        embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
        attn_mask = jnp.pad(attn_mask, ((0, 0), (0, pad)))
        seg_mask = jnp.pad(seg_mask, ((0, 0), (0, pad)))
    maxlen = max(cache_len or (embeds.shape[1] + max_new_tokens),
                 n * chunk_tokens)
    cache = llama.KVCache.init(cfg.llm, b, maxlen, dtype=embeds.dtype,
                               quant=kv_quant)
    h = embeds.shape[-1]
    out_dim = params["text_hidden_fcs"]["fc2"]["kernel"].shape[1]
    carry = PrefillCarry(
        cache=cache,
        seg_emb=jnp.zeros((b, max_segs, out_dim), embeds.dtype),
        seg_count=jnp.zeros((b,), jnp.int32),
        last_hidden=jnp.zeros((b, h), embeds.dtype))
    return embeds, attn_mask, seg_mask, carry


def _llm_extend(params, cfg: MedplibConfig, embeds, cache, c0,
                ep_shard=False):
    if cfg.moe.enable:
        return moe_llama.forward_extend(params["llm"], cfg.llm, cfg.moe,
                                        embeds, cache, c0,
                                        ep_shard=ep_shard)
    return llama.forward_extend(params["llm"], cfg.llm, embeds, cache, c0)


def stream_prefill_chunk(params: Params, cfg: MedplibConfig,
                         carry: PrefillCarry, embeds: jnp.ndarray,
                         attn_mask: jnp.ndarray, seg_mask: jnp.ndarray,
                         c0: jnp.ndarray, chunk_tokens: int,
                         ep_shard: bool = False) -> PrefillCarry:
    """Process prompt positions [c0, c0+chunk_tokens): extend the cache,
    fold the chunk's prompt-SEG captures into the slots IN SEQUENCE ORDER,
    and track each row's last-valid-position hidden. c0 is traced — one
    compiled program per (batch, chunk) shape."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(  # noqa: E731
        a, c0, chunk_tokens, axis=1)
    hidden, cache = _llm_extend(params, cfg, sl(embeds), carry.cache, c0,
                                ep_shard=ep_shard)
    max_segs = carry.seg_emb.shape[1]
    proj = text_hidden_fcs(params["text_hidden_fcs"], hidden)
    p_emb, p_valid, _ = splice_ops.gather_seg_embeddings(
        proj, sl(seg_mask).astype(bool), max_segs)
    seg_emb, seg_count = carry.seg_emb, carry.seg_count
    for j in range(max_segs):  # static, small; appends preserve order
        seg_emb, seg_count = _seg_slot_write(seg_emb, seg_count,
                                             p_emb[:, j], p_valid[:, j])
    last_idx = jnp.maximum(jnp.sum(attn_mask, -1).astype(jnp.int32) - 1, 0)
    li = jnp.clip(jnp.minimum(last_idx, c0 + chunk_tokens - 1) - c0,
                  0, chunk_tokens - 1)
    lh = jnp.take_along_axis(hidden, li[:, None, None], axis=1)[:, 0]
    in_chunk = (last_idx >= c0)[:, None]
    last_hidden = jnp.where(in_chunk, lh.astype(carry.last_hidden.dtype),
                            carry.last_hidden)
    return PrefillCarry(cache=cache, seg_emb=seg_emb, seg_count=seg_count,
                        last_hidden=last_hidden)


def stream_prefill_finish(params: Params, cfg: MedplibConfig,
                          carry: PrefillCarry, attn_mask: jnp.ndarray,
                          do_sample: bool = False, temperature=1.0,
                          top_p=1.0,
                          rng: Optional[jax.Array] = None) -> StreamState:
    """Sample the first token from the chunked-prefill carry and seal the
    cache (length := prompt row sums). Semantics match stream_prefill:
    prompt SEGs already captured chunk-by-chunk; a first-generated-token
    SEG captures this step's hidden."""
    from medplib_tpu.ops import sampling

    b = attn_mask.shape[0]
    last_hidden = carry.last_hidden[:, None]
    key = sampling.row_keys(
        rng if rng is not None else jax.random.PRNGKey(0), b)
    key, sub = sampling.split_rows(key)
    next_tok = sampling.select_token(
        llama.logits(params["llm"], last_hidden)[:, 0], sub, do_sample,
        temperature, top_p)
    first_cap = text_hidden_fcs(params["text_hidden_fcs"], last_hidden)[:, 0]
    seg_emb, seg_count = _seg_slot_write(
        carry.seg_emb, carry.seg_count, first_cap,
        next_tok == cfg.seg_token_idx)
    cache = carry.cache._replace(
        length=jnp.sum(attn_mask.astype(jnp.int32), axis=-1))
    return StreamState(cache=cache, tok=next_tok,
                       done=jnp.zeros((b,), bool), seg_emb=seg_emb,
                       seg_count=seg_count,
                       last_cap=first_cap.astype(seg_emb.dtype), rng=key)


def ground_seg_slots(params: Params, cfg: MedplibConfig,
                     images_sam: jnp.ndarray, seg_emb: jnp.ndarray,
                     seg_count: jnp.ndarray, last_cap: jnp.ndarray,
                     out_size: Optional[int] = None):
    """SAM encode + mask decode from captured SEG slots (fallback last_cap
    in slot 0 when none). images_sam [B, S', S', 3]; seg_emb [B, S, out_dim];
    seg_count [B]; last_cap [B, out_dim]
    -> (mask logits [B, S, out, out], seg_valid [B, S]).

    Shared by stream_ground (whole-batch streaming) and the
    continuous-batching engine (per-slot grounding at retire,
    serve/engine.py)."""
    has_seg = seg_count > 0
    seg_emb = seg_emb.at[:, 0].set(
        jnp.where(has_seg[:, None], seg_emb[:, 0],
                  last_cap.astype(seg_emb.dtype)))
    sam_emb = sam_med2d.encode_image(params["sam"]["image_encoder"],
                                     images_sam, cfg.sam)
    masks, _ = decode_seg_masks(params, cfg, sam_emb, seg_emb,
                                out_size or cfg.sam.image_size)
    s = seg_emb.shape[1]
    seg_valid = jnp.arange(s)[None, :] < seg_count[:, None]
    return masks, seg_valid


def stream_ground(params: Params, cfg: MedplibConfig, batch: Batch,
                  state: StreamState,
                  out_size: Optional[int] = None):
    """Final grounding for a finished stream: SAM encode + mask decode from
    every captured SEG slot (fallback last_cap in slot 0 when none).
    -> (mask logits [B, S, out, out], seg_valid [B, S])."""
    return ground_seg_slots(params, cfg, batch.images_sam, state.seg_emb,
                            state.seg_count, state.last_cap, out_size)
