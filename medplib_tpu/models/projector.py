"""Multimodal projector + ICL extensions + region feature pooling.

Rebuilds, TPU-first:
- mm projector "linear"/"mlpNx_gelu"
  (/root/reference/model/medplib/model/multimodal_projector/builder.py:33-51)
- TokenCompressor 576->256 (medplib_arch.py:67-77): torch AdaptiveAvgPool1d
  becomes a precomputed [out, in] averaging matrix -> one MXU matmul
- MaskTokenEncoder mask->64 tokens (medplib_arch.py:80-108)
- region_fea_adapter + extract_region_feature (medplib_arch.py:131, 580-613):
  the reference's per-mask Python loop of grid_sample gathers becomes a
  closed-form batched contraction — bilinear sampling at every nonzero mask
  cell is a fixed linear operator A on the feature grid, so
  masked-mean-of-samples == (Aᵀ·mask / nnz) @ features. No gathers, static
  shapes, runs for all masks in the batch at once.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.config import ProjectorConfig
from medplib_tpu.ops.initializers import dense_init
from medplib_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


def _init_linear(key, din, dout, dtype):
    return {"kernel": dense_init(key, din, dout, dtype),
            "bias": jnp.zeros((dout,), dtype)}


def _init_ln(dim, dtype):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# ---------------------------------------------------------------------------
# mm projector
# ---------------------------------------------------------------------------

def init_projector(key, cfg: ProjectorConfig, dtype=jnp.float32) -> Params:
    m = re.match(r"^mlp(\d+)x_gelu$", cfg.projector_type)
    if cfg.projector_type == "linear":
        depth = 1
    elif m:
        depth = int(m.group(1))
    else:
        raise ValueError(f"unknown projector type {cfg.projector_type!r}")
    keys = jax.random.split(key, depth)
    layers = [_init_linear(keys[0], cfg.mm_hidden_size, cfg.hidden_size, dtype)]
    for i in range(1, depth):
        layers.append(_init_linear(keys[i], cfg.hidden_size, cfg.hidden_size,
                                   dtype))
    return {"layers": layers}


def apply_projector(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # lora.linear, not a raw matmul: the projector is quantize-eligible
    # (int8/int4 serving trees carry {kernel, scale/scale4} here) and may
    # carry LoRA adapters
    from medplib_tpu.train.lora import linear
    for i, lin in enumerate(p["layers"]):
        if i > 0:
            x = jax.nn.gelu(x, approximate=False)  # torch nn.GELU default
        x = linear(lin, x)
    return x


# ---------------------------------------------------------------------------
# TokenCompressor (adaptive avg-pool over the token axis as a matrix)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] row-stochastic matrix replicating torch
    AdaptiveAvgPool1d bin edges: bin i = [floor(i*n/o), ceil((i+1)*n/o))."""
    mat = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = -(-((i + 1) * n_in) // n_out)
        mat[i, start:end] = 1.0 / (end - start)
    return mat


def init_token_compressor(key, hidden: int, dtype=jnp.float32) -> Params:
    k1, = jax.random.split(key, 1)
    return {"norm": _init_ln(hidden, dtype),
            "proj": _init_linear(k1, hidden, hidden, dtype)}


def apply_token_compressor(p: Params, x: jnp.ndarray, num_tokens: int) -> jnp.ndarray:
    """x: [B, T, H] -> [B, num_tokens, H] (medplib_arch.py:74-77)."""
    pool = jnp.asarray(_adaptive_pool_matrix(x.shape[1], num_tokens), x.dtype)
    x = jnp.einsum("ot,bth->boh", pool, x)
    x = layer_norm(x, p["norm"]["weight"], p["norm"]["bias"])
    return x @ p["proj"]["kernel"] + p["proj"]["bias"]


# ---------------------------------------------------------------------------
# MaskTokenEncoder (medplib_arch.py:80-108)
# ---------------------------------------------------------------------------

_MASK_ENC_CHANNELS = (64, 128, 256, 256)


def init_mask_encoder(key, hidden: int, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, len(_MASK_ENC_CHANNELS) + 1)
    convs = []
    cin = 1
    for i, cout in enumerate(_MASK_ENC_CHANNELS):
        k = (jax.random.normal(ks[i], (3, 3, cin, cout)) *
             (9 * cin) ** -0.5).astype(dtype)
        convs.append({"kernel": k, "bias": jnp.zeros((cout,), dtype)})
        cin = cout
    return {"convs": convs,
            "proj": _init_linear(ks[-1], 256, hidden, dtype),
            "norm": _init_ln(hidden, dtype)}


def apply_mask_encoder(p: Params, masks: jnp.ndarray, num_tokens: int) -> jnp.ndarray:
    """masks: [B, H, W] (binary float) -> [B, num_tokens, hidden].

    Four stride-2 3x3 convs (1->64->128->256->256, GELU between), flatten
    spatial, adaptive-avg-pool to num_tokens, proj 256->hidden, LayerNorm.
    """
    x = masks[..., None].astype(p["convs"][0]["kernel"].dtype)
    for conv in p["convs"]:
        x = jax.lax.conv_general_dilated(
            x, conv["kernel"], window_strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + conv["bias"]
        x = jax.nn.gelu(x, approximate=False)
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    pool = jnp.asarray(_adaptive_pool_matrix(h * w, num_tokens), x.dtype)
    x = jnp.einsum("ot,btc->boc", pool, x)
    x = x @ p["proj"]["kernel"] + p["proj"]["bias"]
    return layer_norm(x, p["norm"]["weight"], p["norm"]["bias"])


# ---------------------------------------------------------------------------
# region_fea_adapter + closed-form region pooling
# ---------------------------------------------------------------------------

def init_region_adapter(key, mm_hidden: int, hidden: int, dtype=jnp.float32):
    return _init_linear(key, mm_hidden, hidden, dtype)


def apply_region_adapter(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["kernel"] + p["bias"]


@lru_cache(maxsize=8)
def _bilinear_sample_matrix(h: int, w: int) -> np.ndarray:
    """[H*W, H*W] matrix A with A[p] = bilinear weights of sampling the grid
    at the reference's slightly-shrunk coordinates for cell p.

    The reference samples feature grid F at normalized coords (y/H, x/W) with
    grid_sample(align_corners=True) (medplib_arch.py:590-608 + point_sample
    at 39-64): pixel position = coord_norm * (size-1), i.e. y*(H-1)/H — NOT
    the integer cell itself. A encodes that fixed resampling exactly.
    """
    A = np.zeros((h * w, h * w), np.float32)
    for y in range(h):
        for x in range(w):
            fy = y * (h - 1) / h
            fx = x * (w - 1) / w
            y0, x0 = int(np.floor(fy)), int(np.floor(fx))
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            dy, dx = fy - y0, fx - x0
            p = y * w + x
            A[p, y0 * w + x0] += (1 - dy) * (1 - dx)
            A[p, y0 * w + x1] += (1 - dy) * dx
            A[p, y1 * w + x0] += dy * (1 - dx)
            A[p, y1 * w + x1] += dy * dx
    return A


def region_pool(feature_map: jnp.ndarray, region_masks: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    """Masked mean of bilinear-resampled region features, batched.

    feature_map: [B, H*W, C] (region_fea_adapter output on the 24x24 CLIP
    grid); region_masks: [B, M, H, W] binary; valid: [B, M] bool.
    -> [B, M, C]; invalid masks give zeros (reference emits NaN->0 via
    nan_to_num, medplib_arch.py:611).

    Equivalent to the reference loop when nnz(mask) <= max_sample_point (the
    reference randomly subsamples beyond 512 points — a training-only
    stochastic cap we deliberately drop: the full-point mean is the
    deterministic limit of that estimator).
    """
    b, m, h, w = region_masks.shape
    A = jnp.asarray(_bilinear_sample_matrix(h, w), feature_map.dtype)
    mflat = region_masks.reshape(b, m, h * w).astype(feature_map.dtype)
    weights = jnp.einsum("bmp,pq->bmq", mflat, A)
    nnz = jnp.maximum(mflat.sum(-1, keepdims=True), 1.0)
    pooled = jnp.einsum("bmq,bqc->bmc", weights / nnz, feature_map)
    return pooled * valid[..., None].astype(pooled.dtype)
