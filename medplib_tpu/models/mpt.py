"""MPT-family decoder (TPU-native).

Covers the reference's legacy MPT stack (component #37, SURVEY.md §2.3):
/root/reference/model/medplib/model/language_model/mpt/ — modeling_mpt.py,
attention.py (ALiBi bias gen_slopes/build_alibi_bias at 497-530, clip_qkv,
qk_ln, softmax_scale), blocks.py (pre-LN block), norm.py
(low-precision layernorm), configuration_mpt.py (d_model/n_heads/n_layers/
expansion_ratio/no_bias/learned_pos_emb), hf_prefixlm_converter.py
(bidirectional-prefix attention). The reference's Triton flash kernel
(flash_attn_triton.py) is replaced by XLA attention here; the MedPLIB paths
never exercise MPT, so the hot path stays the LLaMA stack.

Design: functional params-tree modules like models/llama.py; the layer stack
is a single lax.scan over stacked per-layer weights (uniform blocks — unlike
SAM's mixed window/global blocks).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from medplib_tpu.ops.initializers import dense_init, embed_init

Params = Dict[str, Any]
NEG_INF = -2.3819763e38  # finite: a fully-masked row softmaxes to uniform
                         # instead of NaN-poisoning the whole batch


@dataclasses.dataclass(frozen=True)
class MptConfig:
    d_model: int = 2048
    n_heads: int = 16
    n_layers: int = 24
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    vocab_size: int = 50368
    no_bias: bool = False
    learned_pos_emb: bool = True
    alibi: bool = False
    alibi_bias_max: int = 8
    clip_qkv: Optional[float] = None
    qk_ln: bool = False
    softmax_scale: Optional[float] = None
    prefix_lm: bool = False
    ln_eps: float = 1e-5

    @staticmethod
    def tiny() -> "MptConfig":
        return MptConfig(d_model=64, n_heads=4, n_layers=2, max_seq_len=128,
                         vocab_size=512)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _linear(key, din, dout, dtype, bias: bool):
    p = {"kernel": dense_init(key, din, dout, dtype)}
    if bias:
        p["bias"] = jnp.zeros((dout,), dtype)
    return p


def _ln(dim, dtype, bias: bool):
    p = {"weight": jnp.ones((dim,), dtype)}
    if bias:
        p["bias"] = jnp.zeros((dim,), dtype)
    return p


def init_mpt(key, cfg: MptConfig, dtype=jnp.float32) -> Params:
    d, bias = cfg.d_model, not cfg.no_bias
    k_emb, k_pos, k_layers = jax.random.split(key, 3)

    def init_layer(k):
        ks = jax.random.split(k, 4)
        p = {
            "norm_1": _ln(d, dtype, bias),
            "attn": {
                "Wqkv": _linear(ks[0], d, 3 * d, dtype, bias),
                "out_proj": _linear(ks[1], d, d, dtype, bias),
            },
            "norm_2": _ln(d, dtype, bias),
            "ffn": {
                "up_proj": _linear(ks[2], d, cfg.expansion_ratio * d, dtype,
                                   bias),
                "down_proj": _linear(ks[3], cfg.expansion_ratio * d, d, dtype,
                                     bias),
            },
        }
        if cfg.qk_ln:
            p["attn"]["q_ln"] = _ln(d, dtype, bias)
            p["attn"]["k_ln"] = _ln(d, dtype, bias)
        return p

    layers = jax.vmap(init_layer)(jax.random.split(k_layers, cfg.n_layers))
    params = {
        "wte": {"embedding": embed_init(k_emb, cfg.vocab_size, d, dtype)},
        "blocks": layers,
        "norm_f": _ln(d, dtype, bias),
    }
    if cfg.learned_pos_emb and not cfg.alibi:
        params["wpe"] = {"embedding": embed_init(k_pos, cfg.max_seq_len, d,
                                                 dtype)}
    return params


# ---------------------------------------------------------------------------
# ALiBi (attention.py:497-530 semantics)
# ---------------------------------------------------------------------------

def alibi_slopes(n_heads: int, bias_max: int = 8) -> jnp.ndarray:
    pow2 = 2 ** math.ceil(math.log2(n_heads))
    m = jnp.arange(1, pow2 + 1, dtype=jnp.float32) * (bias_max / pow2)
    slopes = 1.0 / (2.0 ** m)
    if pow2 != n_heads:
        slopes = jnp.concatenate([slopes[1::2], slopes[::2]])[:n_heads]
    return slopes  # [H]


def alibi_bias(n_heads: int, q_pos: jnp.ndarray, k_pos: jnp.ndarray,
               bias_max: int = 8) -> jnp.ndarray:
    """-> [H, Tq, Tk] additive bias: -slope * distance."""
    dist = jnp.abs(k_pos[None, :] - q_pos[:, None]).astype(jnp.float32)
    return -alibi_slopes(n_heads, bias_max)[:, None, None] * dist[None]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _apply_ln(p, x, eps):
    """Low-precision layernorm (norm.py): stats in f32, output in x.dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _lin(p, x):
    y = x @ p["kernel"]
    return y + p["bias"] if "bias" in p else y


def _attn_mask_bias(cfg: MptConfig, q_pos, k_pos, pad_mask, prefix_mask):
    """[B or 1, H, Tq, Tk] additive f32 bias combining causality (+optional
    bidirectional prefix), padding, and ALiBi."""
    causal = k_pos[None, :] <= q_pos[:, None]
    allowed = causal
    if cfg.prefix_lm and prefix_mask is not None:
        # inside the prefix everything attends to everything
        both_prefix = prefix_mask[:, None, :] & prefix_mask[:, q_pos, None]
        allowed = causal[None] | both_prefix
    else:
        allowed = allowed[None]
    if pad_mask is not None:
        allowed = allowed & (pad_mask[:, None, :] > 0)
    bias = jnp.where(allowed[:, None], 0.0, NEG_INF).astype(jnp.float32)
    if cfg.alibi:
        bias = bias + alibi_bias(cfg.n_heads, q_pos, k_pos,
                                 cfg.alibi_bias_max)[None]
    return bias


def _attention(p, cfg: MptConfig, x, bias, kv: Optional[Tuple] = None):
    b, t, d = x.shape
    h = cfg.n_heads
    qkv = _lin(p["Wqkv"], x)
    if cfg.clip_qkv is not None:
        qkv = jnp.clip(qkv, -cfg.clip_qkv, cfg.clip_qkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if cfg.qk_ln:
        q = _apply_ln(p["q_ln"], q, cfg.ln_eps)
        k = _apply_ln(p["k_ln"], k, cfg.ln_eps)
    if kv is not None:  # decode: concat past
        k = jnp.concatenate([kv[0], k], axis=1)
        v = jnp.concatenate([kv[1], v], axis=1)
    new_kv = (k, v)
    s = k.shape[1]
    qh = q.reshape(b, t, h, d // h)
    kh = k.reshape(b, s, h, d // h)
    vh = v.reshape(b, s, h, d // h)
    scale = cfg.softmax_scale or 1.0 / math.sqrt(d / h)
    logits = jnp.einsum("bthc,bshc->bhts", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias
    probs = jax.nn.softmax(logits, -1).astype(x.dtype)
    out = jnp.einsum("bhts,bshc->bthc", probs, vh).reshape(b, t, d)
    return _lin(p["out_proj"], out), new_kv


def _block(p, cfg: MptConfig, x, bias, kv=None):
    a, new_kv = _attention(p["attn"], cfg, _apply_ln(p["norm_1"], x,
                                                     cfg.ln_eps), bias, kv)
    x = x + a
    hdn = jax.nn.gelu(_lin(p["ffn"]["up_proj"],
                           _apply_ln(p["norm_2"], x, cfg.ln_eps)),
                      approximate=True)
    return x + _lin(p["ffn"]["down_proj"], hdn), new_kv


class MptCache(NamedTuple):
    k: jnp.ndarray  # [L, B, T, D]
    v: jnp.ndarray


def forward(params: Params, cfg: MptConfig, input_ids: jnp.ndarray,
            pad_mask: Optional[jnp.ndarray] = None,
            prefix_mask: Optional[jnp.ndarray] = None,
            past: Optional[MptCache] = None):
    """-> (logits [B, T, V], MptCache). `past` supports incremental decode
    (pass the cache from the previous call; input_ids holds only new
    tokens)."""
    b, t = input_ids.shape
    past_len = 0 if past is None else past.k.shape[2]
    x = params["wte"]["embedding"][input_ids]
    pos = jnp.arange(past_len, past_len + t)
    if "wpe" in params:
        x = x + params["wpe"]["embedding"][pos]

    k_pos = jnp.arange(past_len + t)
    if pad_mask is None:
        pad_mask = jnp.ones((b, past_len + t), jnp.int32)
    bias = _attn_mask_bias(cfg, pos, k_pos, pad_mask, prefix_mask)

    ks, vs = [], []
    for i in range(cfg.n_layers):
        lp = jax.tree_util.tree_map(lambda a, i=i: a[i], params["blocks"])
        kv = None if past is None else (past.k[i], past.v[i])
        x, (k, v) = _block(lp, cfg, x, bias, kv)
        ks.append(k)
        vs.append(v)
    x = _apply_ln(params["norm_f"], x, cfg.ln_eps)
    logits = x @ params["wte"]["embedding"].T  # tied embeddings
    return logits, MptCache(jnp.stack(ks), jnp.stack(vs))


def greedy_generate(params: Params, cfg: MptConfig, input_ids: jnp.ndarray,
                    max_new_tokens: int, eos_id: int = 0) -> jnp.ndarray:
    """Simple greedy decode (python loop; MPT is a legacy-parity model, not
    the serving path)."""
    logits, cache = forward(params, cfg, input_ids)
    out = []
    tok = jnp.argmax(logits[:, -1], -1)
    for _ in range(max_new_tokens):
        out.append(tok)
        logits, cache = forward(params, cfg, tok[:, None], past=cache)
        tok = jnp.argmax(logits[:, -1], -1)
    return jnp.stack(out, axis=1)
