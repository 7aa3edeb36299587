"""SAM-Med2D (ViT-B @256, adapter-tuned) — image encoder, prompt encoder,
two-way-transformer mask decoder.

Rebuild of /root/reference/model/segment_anything_med2d/ (build_sam.py:51-61,
modeling/image_encoder.py, prompt_encoder.py, mask_decoder.py,
transformer.py), TPU-first:

- NHWC everywhere (TPU conv layout); the reference's NCHW permutes vanish
- windowed attention (window 14 over the 16x16 grid, global at layers
  2/5/8/11) via static reshape/transpose window partition — all shapes are
  compile-time constants, so XLA tiles the 196-token window batches onto the
  MXU as one batched matmul
- decomposed rel-pos bias (image_encoder.py:380-421) built with static-index
  lookups and fused einsums
- the whole encoder is batched: the reference encodes images one by one in a
  Python loop (MedPLIB.py:277-282); here a single call handles [B, ...]

The MedPLIB pixel-grounding path only exercises text_embeds prompts
(prompt_encoder.py:177-178) + the no-mask dense embedding; point/box/mask
prompts are implemented for full SAM capability parity (predictor API).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.config import SamConfig
from medplib_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# init (random; trained weights come from utils.hf_weights.sam_from_torch)
# ---------------------------------------------------------------------------

def init_sam(key, cfg: SamConfig, dtype=jnp.float32) -> Params:
    from medplib_tpu.ops.initializers import dense_init

    def lin(k, din, dout, bias=True):
        d = {"kernel": dense_init(k, din, dout, dtype)}
        if bias:
            d["bias"] = jnp.zeros((dout,), dtype)
        return d

    def ln(dim):
        return {"weight": jnp.ones((dim,), dtype),
                "bias": jnp.zeros((dim,), dtype)}

    def conv(k, kh, kw, cin, cout, bias=True, torch_layout=False):
        shape = (cin, cout, kh, kw) if torch_layout else (kh, kw, cin, cout)
        d = {"kernel": (jax.random.normal(k, shape) *
                        (kh * kw * cin) ** -0.5).astype(dtype)}
        if bias:
            d["bias"] = jnp.zeros((cout,), dtype)
        return d

    e = cfg.encoder_embed_dim
    d_head = e // cfg.encoder_num_heads
    grid = cfg.image_embedding_size
    keys = iter(jax.random.split(key, 64))

    def init_block(k):
        ks = jax.random.split(k, 8)
        max_rel = 2 * max(cfg.window_size, grid) - 1
        blk = {
            "norm1": ln(e),
            "attn": {
                "qkv": lin(ks[0], e, 3 * e),
                "proj": lin(ks[1], e, e),
                "rel_pos_h": jnp.zeros((max_rel, d_head), dtype),
                "rel_pos_w": jnp.zeros((max_rel, d_head), dtype),
            },
            "norm2": ln(e),
            "mlp": {"lin1": lin(ks[2], e, int(e * cfg.mlp_ratio)),
                    "lin2": lin(ks[3], int(e * cfg.mlp_ratio), e)},
        }
        if cfg.use_adapter:
            hid = int(e * cfg.adapter_ratio)
            blk["adapter"] = {
                "channel_fc1": {"kernel": dense_init(ks[4], e, hid, dtype)},
                "channel_fc2": {"kernel": dense_init(ks[5], hid, e, dtype)},
                "spatial_conv": conv(ks[6], 3, 3, e, e, bias=False),
                "spatial_convt": conv(ks[7], 4, 4, e, e, bias=False,
                                      torch_layout=True),
                "norm": ln(e),
            }
        return blk

    blocks = jax.vmap(init_block)(
        jax.random.split(next(keys), cfg.encoder_depth))
    pd = cfg.prompt_embed_dim
    enc = {
        "patch_embed": {
            **conv(next(keys), cfg.patch_size, cfg.patch_size, 3, e)},
        "pos_embed": jnp.zeros((1, grid, grid, e), dtype),
        "blocks": blocks,
        "neck": {
            "conv1": conv(next(keys), 1, 1, e, pd, bias=False),
            "ln1": ln(pd),
            "conv2": conv(next(keys), 3, 3, pd, pd, bias=False),
            "ln2": ln(pd),
        },
    }
    mc = cfg.mask_in_chans
    pe = {
        "pe_layer": {"gaussian_matrix": jax.random.normal(
            next(keys), (2, pd // 2)).astype(dtype)},
        "point_embeddings": (jax.random.normal(next(keys), (4, pd)) * 0.02
                             ).astype(dtype),
        "not_a_point_embed": jnp.zeros((pd,), dtype),
        "no_mask_embed": jnp.zeros((pd,), dtype),
        "mask_downscaling": {
            "conv1": conv(next(keys), 2, 2, 1, mc // 4),
            "ln1": ln(mc // 4),
            "conv2": conv(next(keys), 2, 2, mc // 4, mc),
            "ln2": ln(mc),
            "conv3": conv(next(keys), 1, 1, mc, pd),
        },
    }
    num_mask_tokens = cfg.num_multimask_outputs + 1

    def attn_block():
        dim = pd
        inner = pd // 2
        return {"q_proj": lin(next(keys), dim, inner),
                "k_proj": lin(next(keys), dim, inner),
                "v_proj": lin(next(keys), dim, inner),
                "out_proj": lin(next(keys), inner, dim)}

    def self_attn_block():
        return {n: lin(next(keys), pd, pd)
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")}

    layers = []
    for _ in range(cfg.decoder_depth):
        layers.append({
            "self_attn": self_attn_block(),
            "norm1": ln(pd),
            "cross_attn_token_to_image": attn_block(),
            "norm2": ln(pd),
            "mlp": {"lin1": lin(next(keys), pd, cfg.decoder_mlp_dim),
                    "lin2": lin(next(keys), cfg.decoder_mlp_dim, pd)},
            "norm3": ln(pd),
            "cross_attn_image_to_token": attn_block(),
            "norm4": ln(pd),
        })
    md = {
        "iou_token": (jax.random.normal(next(keys), (1, pd)) * 0.02
                      ).astype(dtype),
        "mask_tokens": (jax.random.normal(next(keys), (num_mask_tokens, pd))
                        * 0.02).astype(dtype),
        "transformer": {
            "layers": layers,
            "final_attn_token_to_image": attn_block(),
            "norm_final_attn": ln(pd),
        },
        "output_upscaling": {
            "convt1": conv(next(keys), 2, 2, pd, pd // 4, torch_layout=True),
            "ln": ln(pd // 4),
            "convt2": conv(next(keys), 2, 2, pd // 4, pd // 8,
                           torch_layout=True),
        },
        "output_hypernetworks_mlps": [
            [lin(next(keys), pd, pd), lin(next(keys), pd, pd),
             lin(next(keys), pd, pd // 8)] for _ in range(num_mask_tokens)],
        "iou_prediction_head": (
            [lin(next(keys), pd, cfg.iou_head_hidden_dim)] +
            [lin(next(keys), cfg.iou_head_hidden_dim, cfg.iou_head_hidden_dim)
             for _ in range(cfg.iou_head_depth - 2)] +
            [lin(next(keys), cfg.iou_head_hidden_dim, num_mask_tokens)]),
    }
    return {"image_encoder": enc, "prompt_encoder": pe, "mask_decoder": md}


# ---------------------------------------------------------------------------
# image encoder
# ---------------------------------------------------------------------------

def _window_partition(x: jnp.ndarray, ws: int):
    """[B, H, W, C] -> [B*nW, ws, ws, C], padding H/W up to multiples of ws."""
    b, h, w, c = x.shape
    pad_h, pad_w = -h % ws, -w % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def _window_unpartition(x: jnp.ndarray, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp * wp // ws // ws)
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _rel_pos_bias(q_hw: Tuple[int, int], rel_pos_h: jnp.ndarray,
                  rel_pos_w: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Decomposed rel-pos attention bias (image_encoder.py:380-421), q/k same
    size. q: [B*heads, H, W, d] -> bias [B*heads, H*W, H*W]."""
    h, w = q_hw
    idx_h = np.arange(h)[:, None] - np.arange(h)[None, :] + (h - 1)
    idx_w = np.arange(w)[:, None] - np.arange(w)[None, :] + (w - 1)
    rh = jnp.take(rel_pos_h, jnp.asarray(idx_h), axis=0)  # [h, h, d]
    rw = jnp.take(rel_pos_w, jnp.asarray(idx_w), axis=0)  # [w, w, d]
    rel_h = jnp.einsum("bhwc,hkc->bhwk", q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", q, rw)
    bias = rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return bias.reshape(q.shape[0], h * w, h * w)


def _encoder_attention(p: Params, x: jnp.ndarray, num_heads: int,
                       use_rel_pos: bool) -> jnp.ndarray:
    """x: [B, H, W, C] (windowed or global grid)."""
    b, h, w, c = x.shape
    d = c // num_heads
    qkv = x.reshape(b, h * w, c) @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    qkv = qkv.reshape(b, h * w, 3, num_heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]  # [B, heads, HW, d]
    q = q.reshape(b * num_heads, h * w, d)
    k = k.reshape(b * num_heads, h * w, d)
    v = v.reshape(b * num_heads, h * w, d)

    logits = jnp.einsum("bqd,bkd->bqk", q * (d ** -0.5), k,
                        preferred_element_type=jnp.float32)
    if use_rel_pos:
        logits = logits + _rel_pos_bias(
            (h, w), p["rel_pos_h"], p["rel_pos_w"],
            q.reshape(b * num_heads, h, w, d).astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkd->bqd", probs, v)
    out = out.reshape(b, num_heads, h, w, d).transpose(0, 2, 3, 1, 4)
    out = out.reshape(b, h, w, c)
    return out @ p["proj"]["kernel"] + p["proj"]["bias"]


def _adapter(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Adapter_Layer (image_encoder.py:18-56): SE channel gate -> conv/convT
    spatial refinement -> skip -> LayerNorm. NHWC throughout."""
    pooled = jnp.mean(x, axis=(1, 2))  # [B, C]
    gate = pooled @ p["channel_fc1"]["kernel"]
    gate = jax.nn.relu(gate) @ p["channel_fc2"]["kernel"]
    gate = jax.nn.sigmoid(gate)
    xc = x * gate[:, None, None, :]

    s = jax.lax.conv_general_dilated(
        xc, p["spatial_conv"]["kernel"], window_strides=(2, 2),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    s = jax.nn.relu(s)
    # ConvTranspose2d(k=4, s=2, p=1): lhs-dilated conv with spatially-flipped,
    # in/out-swapped kernel, pad k-1-p=2
    s = jax.lax.conv_general_dilated(
        s, _convt_kernel(p["spatial_convt"]["kernel"]), window_strides=(1, 1),
        padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    s = jax.nn.relu(s)
    x = x + s
    return layer_norm(x, p["norm"]["weight"], p["norm"]["bias"], eps=1e-6)


def _encoder_block(p: Params, x: jnp.ndarray, cfg: SamConfig,
                   window_size: int) -> jnp.ndarray:
    shortcut = x
    x = layer_norm(x, p["norm1"]["weight"], p["norm1"]["bias"],
                   cfg.layer_norm_eps)
    if window_size > 0:
        hw = x.shape[1:3]
        x, pad_hw = _window_partition(x, window_size)
    x = _encoder_attention(p["attn"], x, cfg.encoder_num_heads,
                           cfg.use_rel_pos)
    if window_size > 0:
        x = _window_unpartition(x, window_size, pad_hw, hw)
    x = shortcut + x

    xn = layer_norm(x, p["norm2"]["weight"], p["norm2"]["bias"],
                    cfg.layer_norm_eps)
    mlp = _gelu(xn @ p["mlp"]["lin1"]["kernel"] + p["mlp"]["lin1"]["bias"])
    mlp = mlp @ p["mlp"]["lin2"]["kernel"] + p["mlp"]["lin2"]["bias"]
    if cfg.use_adapter:
        x = x + mlp + _adapter(p["adapter"], xn)
    else:
        x = x + mlp
    return x


def encode_image(params: Params, images: jnp.ndarray,
                 cfg: SamConfig) -> jnp.ndarray:
    """images: [B, H, W, 3] already pixel-normalized -> [B, h, w, 256]
    image embeddings (h = w = image_size/16)."""
    images = images.astype(params["patch_embed"]["kernel"].dtype)
    x = jax.lax.conv_general_dilated(
        images, params["patch_embed"]["kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["bias"]
    x = x + params["pos_embed"]

    # blocks differ structurally (window vs global) -> unrolled loop over the
    # 12 blocks; per-block params are indexed out of the stacked tree
    for i in range(cfg.encoder_depth):
        block_p = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        ws = 0 if i in cfg.encoder_global_attn_indexes else cfg.window_size
        x = _encoder_block(block_p, x, cfg, ws)

    # neck: 1x1 conv -> LN -> 3x3 conv -> LN (channels-last)
    n = params["neck"]
    x = jax.lax.conv_general_dilated(
        x, n["conv1"]["kernel"], window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = layer_norm(x, n["ln1"]["weight"], n["ln1"]["bias"], eps=1e-6)
    x = jax.lax.conv_general_dilated(
        x, n["conv2"]["kernel"], window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = layer_norm(x, n["ln2"]["weight"], n["ln2"]["bias"], eps=1e-6)
    return x


def preprocess_pixels(images_rgb: jnp.ndarray, cfg: SamConfig) -> jnp.ndarray:
    """[B, H, W, 3] uint8/float RGB -> normalized float (sam.py:46-47)."""
    mean = jnp.asarray(cfg.pixel_mean)
    std = jnp.asarray(cfg.pixel_std)
    return (images_rgb.astype(jnp.float32) - mean) / std


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

def _pe_encoding(gaussian: jnp.ndarray, coords01: jnp.ndarray) -> jnp.ndarray:
    """coords in [0,1]^2, last dim (x, y) -> [..., 2*num_feats]
    (prompt_encoder.py:190-236)."""
    c = (2.0 * coords01 - 1.0) @ gaussian.astype(jnp.float32)
    c = 2.0 * jnp.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def dense_pe(params: Params, cfg: SamConfig) -> jnp.ndarray:
    """Positional grid for the image embedding -> [h, w, embed_dim]."""
    h = w = cfg.image_embedding_size
    y = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    x = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # [h,w,(x,y)]
    return _pe_encoding(params["pe_layer"]["gaussian_matrix"], grid)


def embed_points(params: Params, cfg: SamConfig, coords: jnp.ndarray,
                 labels: jnp.ndarray) -> jnp.ndarray:
    """coords [B,N,2] in input-image pixels (x,y); labels [B,N] in
    {-1: pad, 0: neg, 1: pos} -> [B,N,embed_dim]."""
    size = jnp.asarray([cfg.image_size, cfg.image_size], jnp.float32)
    c01 = (coords + 0.5) / size
    pe = _pe_encoding(params["pe_layer"]["gaussian_matrix"], c01)
    pe = jnp.where((labels == -1)[..., None], 0.0, pe)
    pe = pe + jnp.where(
        (labels == -1)[..., None], params["not_a_point_embed"][None, None], 0.0)
    pe = pe + jnp.where(
        (labels == 0)[..., None], params["point_embeddings"][0][None, None], 0.0)
    pe = pe + jnp.where(
        (labels == 1)[..., None], params["point_embeddings"][1][None, None], 0.0)
    return pe


def embed_boxes(params: Params, cfg: SamConfig, boxes: jnp.ndarray):
    """boxes [B,4] (x0,y0,x1,y1) -> [B,2,embed_dim]."""
    size = jnp.asarray([cfg.image_size, cfg.image_size], jnp.float32)
    corners = (boxes.reshape(-1, 2, 2) + 0.5) / size
    pe = _pe_encoding(params["pe_layer"]["gaussian_matrix"], corners)
    pe = pe.at[:, 0].add(params["point_embeddings"][2])
    pe = pe.at[:, 1].add(params["point_embeddings"][3])
    return pe


def embed_mask_input(params: Params, masks: jnp.ndarray) -> jnp.ndarray:
    """masks [B, 4h, 4w, 1] -> dense embedding [B, h, w, embed_dim]."""
    p = params["mask_downscaling"]
    x = masks.astype(p["conv1"]["kernel"].dtype)

    def conv(x, cp, stride):
        return jax.lax.conv_general_dilated(
            x, cp["kernel"], window_strides=(stride, stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + cp["bias"]

    x = conv(x, p["conv1"], 2)
    x = layer_norm(x, p["ln1"]["weight"], p["ln1"]["bias"], eps=1e-6)
    x = _gelu(x)
    x = conv(x, p["conv2"], 2)
    x = layer_norm(x, p["ln2"]["weight"], p["ln2"]["bias"], eps=1e-6)
    x = _gelu(x)
    return conv(x, p["conv3"], 1)


def encode_prompts(
    params: Params, cfg: SamConfig, batch: int,
    points: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    boxes: Optional[jnp.ndarray] = None,
    mask_input: Optional[jnp.ndarray] = None,
    text_embeds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (sparse [B, N, D], dense [B, h, w, D]). MedPLIB's SEG path passes
    only text_embeds [B, 1, D] (MedPLIB.py:473-502; prompt_encoder.py:177-178)."""
    parts = []
    if points is not None:
        coords, labels = points
        if boxes is None:  # pad with a not-a-point slot
            coords = jnp.concatenate(
                [coords, jnp.zeros_like(coords[:, :1])], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones_like(labels[:, :1])], axis=1)
        parts.append(embed_points(params, cfg, coords, labels))
    if boxes is not None:
        parts.append(embed_boxes(params, cfg, boxes))
    if text_embeds is not None:
        parts.append(text_embeds)
    sparse = (jnp.concatenate(parts, axis=1) if parts
              else jnp.zeros((batch, 0, cfg.prompt_embed_dim)))
    if mask_input is not None:
        dense = embed_mask_input(params, mask_input)
    else:
        s = cfg.image_embedding_size
        dense = jnp.broadcast_to(
            params["no_mask_embed"][None, None, None],
            (batch, s, s, cfg.prompt_embed_dim))
    return sparse, dense


# ---------------------------------------------------------------------------
# two-way transformer mask decoder
# ---------------------------------------------------------------------------

def _decoder_attention(p: Params, q, k, v, num_heads: int):
    """SAM decoder attention with optional internal downsampling
    (transformer.py:186-240)."""
    def proj(name, x):
        return x @ p[name]["kernel"] + p[name]["bias"]

    q, k, v = proj("q_proj", q), proj("k_proj", k), proj("v_proj", v)
    b, nq, c = q.shape
    d = c // num_heads
    q = q.reshape(b, nq, num_heads, d)
    k = k.reshape(b, -1, num_heads, d)
    v = v.reshape(b, -1, num_heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, nq, c)
    return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]


def _ln(p, x, eps=1e-5):
    return layer_norm(x, p["weight"], p["bias"], eps)


def two_way_transformer(p: Params, image_embedding: jnp.ndarray,
                        image_pe: jnp.ndarray, point_embedding: jnp.ndarray,
                        cfg: SamConfig):
    """image_embedding/image_pe: [B, h*w, D]; point_embedding: [B, N, D]
    -> (queries [B, N, D], keys [B, h*w, D])."""
    nh = cfg.decoder_num_heads
    queries, keys = point_embedding, image_embedding
    for i, lp in enumerate(p["layers"]):
        if i == 0:
            queries = _decoder_attention(lp["self_attn"], queries, queries,
                                         queries, nh)
        else:
            q = queries + point_embedding
            queries = queries + _decoder_attention(lp["self_attn"], q, q,
                                                   queries, nh)
        queries = _ln(lp["norm1"], queries)

        q = queries + point_embedding
        k = keys + image_pe
        queries = queries + _decoder_attention(
            lp["cross_attn_token_to_image"], q, k, keys, nh)
        queries = _ln(lp["norm2"], queries)

        mlp = jax.nn.relu(queries @ lp["mlp"]["lin1"]["kernel"] +
                          lp["mlp"]["lin1"]["bias"])
        mlp = mlp @ lp["mlp"]["lin2"]["kernel"] + lp["mlp"]["lin2"]["bias"]
        queries = _ln(lp["norm3"], queries + mlp)

        q = queries + point_embedding
        k = keys + image_pe
        keys = keys + _decoder_attention(
            lp["cross_attn_image_to_token"], k, q, queries, nh)
        keys = _ln(lp["norm4"], keys)

    q = queries + point_embedding
    k = keys + image_pe
    queries = queries + _decoder_attention(
        p["final_attn_token_to_image"], q, k, keys, nh)
    queries = _ln(p["norm_final_attn"], queries)
    return queries, keys


def _mlp(layers, x, final_sigmoid=False):
    for i, lin in enumerate(layers):
        x = x @ lin["kernel"] + lin["bias"]
        if i < len(layers) - 1:
            x = jax.nn.relu(x)
    return jax.nn.sigmoid(x) if final_sigmoid else x


def decode_masks(
    params: Params, cfg: SamConfig,
    image_embeddings: jnp.ndarray,  # [B, h, w, D]
    image_pe: jnp.ndarray,          # [h, w, D]
    sparse_prompts: jnp.ndarray,    # [B, N, D]
    dense_prompts: jnp.ndarray,     # [B, h, w, D]
    multimask_output: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (low-res mask logits [B, M, 4h, 4w], iou predictions [B, M]).

    Batched over B: the reference decodes one SEG embedding at a time
    (MedPLIB.py:473-502); here every SEG token in the batch decodes in one
    call (hot loop (e) in SURVEY.md §3).
    """
    p = params
    b = sparse_prompts.shape[0]
    num_mask_tokens = cfg.num_multimask_outputs + 1
    # run the decoder in the weight dtype: dense_pe/_pe_encoding compute in
    # f32 (sin/cos accuracy) but a f32 operand would promote the whole head
    # and break bf16 convs
    wdtype = p["iou_token"].dtype
    image_pe = image_pe.astype(wdtype)
    output_tokens = jnp.concatenate([p["iou_token"], p["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None], (b,) + output_tokens.shape),
         sparse_prompts.astype(wdtype)], axis=1)

    h, w = image_embeddings.shape[1:3]
    src = (image_embeddings.astype(wdtype) +
           dense_prompts.astype(wdtype)).reshape(b, h * w, -1)
    pos = jnp.broadcast_to(image_pe.reshape(1, h * w, -1),
                           (b, h * w, image_pe.shape[-1]))

    hs, src = two_way_transformer(p["transformer"], src, pos, tokens, cfg)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + num_mask_tokens]

    # upscale 2x ConvTranspose(k2,s2) twice: h -> 4h
    src = src.reshape(b, h, w, -1)
    up = p["output_upscaling"]
    x = jax.lax.conv_general_dilated(
        src, _convt_kernel(up["convt1"]["kernel"]), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + up["convt1"]["bias"]
    x = _gelu(layer_norm(x, up["ln"]["weight"], up["ln"]["bias"], eps=1e-6))
    x = jax.lax.conv_general_dilated(
        x, _convt_kernel(up["convt2"]["kernel"]), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + up["convt2"]["bias"]
    upscaled = _gelu(x)  # [B, 4h, 4w, D/8]

    hyper = jnp.stack(
        [_mlp(p["output_hypernetworks_mlps"][i], mask_tokens_out[:, i])
         for i in range(num_mask_tokens)], axis=1)  # [B, M, D/8]
    masks = jnp.einsum("bmc,bhwc->bmhw", hyper, upscaled)
    iou_pred = _mlp(p["iou_prediction_head"], iou_token_out)

    if multimask_output:
        return masks[:, 1:], iou_pred[:, 1:]
    return masks[:, :1], iou_pred[:, :1]


def _convt_kernel(w_torch_layout: jnp.ndarray) -> jnp.ndarray:
    """torch ConvTranspose2d weight [Cin, Cout, kh, kw] -> equivalent HWIO
    correlation kernel (spatially flipped, in/out to last two axes)."""
    w = w_torch_layout[:, :, ::-1, ::-1]
    return jnp.transpose(w, (2, 3, 0, 1))


def postprocess_masks(masks: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Bilinear upsample low-res logits [B, M, h, w] -> [B, M, out, out]
    (align_corners=False semantics, matching F.interpolate in sam.py /
    MedPLIB.py:682-702)."""
    b, m, h, w = masks.shape
    x = masks.reshape(b * m, h, w, 1)
    x = jax.image.resize(x, (b * m, out_size, out_size, 1), method="bilinear")
    return x.reshape(b, m, out_size, out_size)
