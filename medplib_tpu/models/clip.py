"""CLIP ViT vision tower (openai/clip-vit-large-patch14-336 semantics).

Rebuild of the frozen HF `CLIPVisionModel` the reference wraps
(/root/reference/model/medplib/model/multimodal_encoder/clip_encoder.py:6-87):
hidden layer select (`select_layer=-2`) + CLS drop -> 576 patch features.

TPU-first: the per-image Python list loop in the reference forward
(clip_encoder.py:44-53) is replaced by one batched forward; the layer stack
is a `lax.scan` and the selected intermediate layer falls out of the scan's
stacked outputs without materializing all hidden states in HBM (XLA DCEs the
unused tail... the select is a static index into the scan ys).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from medplib_tpu.config import ClipVisionConfig
from medplib_tpu.ops.initializers import dense_init, embed_init
from medplib_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_linear(key, din, dout, dtype):
    return {"kernel": dense_init(key, din, dout, dtype),
            "bias": jnp.zeros((dout,), dtype)}


def _init_ln(dim, dtype):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_clip_vision(key, cfg: ClipVisionConfig, dtype=jnp.float32) -> Params:
    h = cfg.hidden_size
    n_pos = cfg.num_patches + 1
    ks = jax.random.split(key, 4)

    def init_layer(k):
        lk = jax.random.split(k, 6)
        return {
            "layer_norm1": _init_ln(h, dtype),
            "attn": {
                "q_proj": _init_linear(lk[0], h, h, dtype),
                "k_proj": _init_linear(lk[1], h, h, dtype),
                "v_proj": _init_linear(lk[2], h, h, dtype),
                "out_proj": _init_linear(lk[3], h, h, dtype),
            },
            "layer_norm2": _init_ln(h, dtype),
            "mlp": {
                "fc1": _init_linear(lk[4], h, cfg.intermediate_size, dtype),
                "fc2": _init_linear(lk[5], cfg.intermediate_size, h, dtype),
            },
        }

    layer_keys = jax.random.split(ks[2], cfg.num_layers)
    return {
        "embeddings": {
            "class_embedding": (jax.random.normal(ks[0], (h,)) * 0.02).astype(dtype),
            "patch_embedding": {
                "kernel": (jax.random.normal(
                    ks[1], (cfg.patch_size, cfg.patch_size, 3, h)) * 0.02
                ).astype(dtype)},
            "position_embedding": {
                "embedding": embed_init(ks[3], n_pos, h, dtype)},
        },
        "pre_layrnorm": _init_ln(h, dtype),
        "layers": jax.vmap(init_layer)(layer_keys),
        "post_layernorm": _init_ln(h, dtype),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _attention(p: Params, x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, h = x.shape
    d = h // num_heads

    def proj(name):
        return (x @ p[name]["kernel"] + p[name]["bias"]).reshape(b, t, num_heads, d)

    q, k, v = proj("q_proj"), proj("k_proj"), proj("v_proj")
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, h)
    return out @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]


def embeddings(p: Params, pixel_values: jnp.ndarray, cfg: ClipVisionConfig):
    """pixel_values: [B, H, W, 3] (NHWC) -> [B, 1+P, hidden]."""
    b = pixel_values.shape[0]
    pixel_values = pixel_values.astype(p["patch_embedding"]["kernel"].dtype)
    patches = jax.lax.conv_general_dilated(
        pixel_values, p["patch_embedding"]["kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(p["class_embedding"][None, None],
                           (b, 1, cfg.hidden_size)).astype(patches.dtype)
    x = jnp.concatenate([cls, patches], axis=1)
    return x + p["position_embedding"]["embedding"][None]


def encoder_layer(p: Params, x: jnp.ndarray, cfg: ClipVisionConfig):
    h = layer_norm(x, p["layer_norm1"]["weight"], p["layer_norm1"]["bias"],
                   cfg.layer_norm_eps)
    x = x + _attention(p["attn"], h, cfg.num_heads)
    h = layer_norm(x, p["layer_norm2"]["weight"], p["layer_norm2"]["bias"],
                   cfg.layer_norm_eps)
    h = quick_gelu(h @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"])
    h = h @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"]
    return x + h


def forward_features(params: Params, pixel_values: jnp.ndarray,
                     cfg: ClipVisionConfig) -> jnp.ndarray:
    """-> selected hidden layer's patch features [B, P, hidden].

    Matches HF hidden_states indexing: tuple[j] = input of layer j, so
    select_layer=-2 is the output after num_layers-1 layers; CLS dropped for
    select_feature="patch" (clip_encoder.py:32-39).
    """
    x = embeddings(params["embeddings"], pixel_values, cfg)
    x = layer_norm(x, params["pre_layrnorm"]["weight"],
                   params["pre_layrnorm"]["bias"], cfg.layer_norm_eps)

    def body(x, layer_p):
        y = encoder_layer(layer_p, x, cfg)
        return y, y

    _, ys = jax.lax.scan(body, x, params["layers"])
    sl = cfg.select_layer
    idx = sl if sl < 0 else sl - 1  # ys[i] = output of layer i
    feats = ys[idx]
    if cfg.select_feature == "patch":
        feats = feats[:, 1:]
    return feats
