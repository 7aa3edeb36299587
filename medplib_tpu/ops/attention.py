"""Attention ops: batched causal prefill + single-step cached decode.

TPU-native replacement for the reference's flash-attn monkey patch
(/root/reference/model/medplib/train/llama_flash_attn_monkey_patch.py) and
the manual token-by-token KV-cache decode loop
(/root/reference/model/serve/model_worker.py:393-427).

Two implementations behind one API:
  - "xla":   einsum + f32 softmax. XLA already emits a fused, MXU-tiled
             attention for this on TPU; it is the correctness reference.
  - "flash": Pallas blockwise flash attention (ops/pallas/flash_attention.py)
             used for long-sequence prefill.
Selection: `impl="auto"` uses flash on TPU for prefill lengths >= 1024,
else xla.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -2.3819763e38  # ~ -max bf16, used by XLA attention masks


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, S, KV, D] -> [B, S, KV*n_rep, D] (GQA head replication)."""
    if n_rep == 1:
        return x
    b, s, kv, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, kv, n_rep, d)).reshape(
        b, s, kv * n_rep, d)


def _xla_attention(q, k, v, bias):
    """q:[B,T,H,D] k,v:[B,S,H,D] bias:[B,1,T,S] additive or None."""
    d = q.shape[-1]
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (d ** -0.5)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def make_causal_bias(attn_mask: Optional[jnp.ndarray], q_len: int, kv_len: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Additive bias [B,1,T,S] combining causality (queries occupy the last
    q_len slots of the kv axis) with an optional [B,S] padding mask."""
    offset = kv_len - q_len
    qi = jnp.arange(q_len)[:, None] + offset
    ki = jnp.arange(kv_len)[None, :]
    causal = qi >= ki  # [T, S]
    allowed = causal[None, None]
    if attn_mask is not None:
        allowed = jnp.logical_and(allowed, attn_mask[:, None, None, :].astype(bool))
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)


def causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Prefill attention.

    q: [B, T, H, D]; k, v: [B, S, KV, D] with S >= T (queries are the last T
    positions); attn_mask: optional [B, S] 1=keep padding mask.
    """
    n_rep = q.shape[2] // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    use_flash = impl == "flash" or (
        impl == "auto"
        and jax.default_backend() == "tpu"
        # measured on v5e: XLA's fused attention wins below ~1k tokens
        # (623-token VQA prefill: 516ms XLA vs 544ms flash at B=8)
        and q.shape[1] >= 1024
        and q.shape[-1] % 128 == 0
    )
    if use_flash:
        from medplib_tpu.ops.pallas.flash_attention import flash_attention
        return flash_attention(q, k, v, attn_mask=attn_mask, causal=True)
    bias = make_causal_bias(attn_mask, q.shape[1], k.shape[1])
    return _xla_attention(q, k, v, bias)


def decode_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,
) -> jnp.ndarray:
    """Single decode step: q [B, 1, H, D] vs cache [B, MAX, KV, D]; positions
    >= cache_len (per-batch int32) are masked out."""
    n_rep = q.shape[2] // k_cache.shape[2]
    k = _repeat_kv(k_cache, n_rep)
    v = _repeat_kv(v_cache, n_rep)
    d = q.shape[-1]
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    pos = jnp.arange(k.shape[1])[None, None, None, :]
    valid = pos < cache_len.reshape(-1, 1, 1, 1)
    logits = jnp.where(valid, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def decode_attention_quant(
    q: jnp.ndarray,
    k_q: jnp.ndarray, k_s: jnp.ndarray,
    v_q: jnp.ndarray, v_s: jnp.ndarray,
    cache_len: jnp.ndarray,
) -> jnp.ndarray:
    """Decode attention over an int8-quantized KV cache (per-token-per-head
    symmetric scales). Decode is HBM-bound on cache reads — int8 halves
    that traffic (VERDICT round-2 task 7; beyond the reference's scope).

    q [B, 1, H, D]; k_q/v_q [B, MAX, KV, D] int8; k_s/v_s [B, MAX, KV, 1]
    f32 absmax/127 scales. The scales are applied AFTER the dots (scores *=
    k_s per position; probs *= v_s before the value dot), so no dequantized
    bf16 copy of the cache is ever materialized — the int8->bf16 cast fuses
    into the dot operand read."""
    n_rep = q.shape[2] // k_q.shape[2]
    k = _repeat_kv(k_q.astype(q.dtype), n_rep)
    v = _repeat_kv(v_q.astype(q.dtype), n_rep)
    ks = jnp.moveaxis(_repeat_kv(k_s, n_rep), (1, 2, 3), (3, 1, 2))  # [B,H,1,S]
    vs = jnp.moveaxis(_repeat_kv(v_s, n_rep), (1, 2, 3), (3, 1, 2))
    d = q.shape[-1]
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * ks.astype(jnp.float32) * (d ** -0.5)
    pos = jnp.arange(k.shape[1])[None, None, None, :]
    valid = pos < cache_len.reshape(-1, 1, 1, 1)
    logits = jnp.where(valid, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = (probs * vs.astype(jnp.float32)).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def extend_attention(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    c0: jnp.ndarray,
) -> jnp.ndarray:
    """Chunked-prefill extend: q [B, C, H, D] holds the chunk of prompt
    tokens at absolute positions [c0, c0+C); the chunk's K/V are already
    written into the cache [B, MAX, KV, D]. Each query attends causally to
    cache positions <= its own (prompts are left-aligned, so keys past a
    row's true length are only reachable by padding queries, whose outputs
    are never read downstream)."""
    n_rep = q.shape[2] // k_cache.shape[2]
    k = _repeat_kv(k_cache, n_rep)
    v = _repeat_kv(v_cache, n_rep)
    d = q.shape[-1]
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    pos = jnp.arange(k.shape[1])[None, None, None, :]
    qpos = (c0 + jnp.arange(q.shape[1])).reshape(1, 1, -1, 1)
    logits = jnp.where(pos <= qpos, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def extend_attention_quant(
    q: jnp.ndarray,
    k_q: jnp.ndarray, k_s: jnp.ndarray,
    v_q: jnp.ndarray, v_s: jnp.ndarray,
    c0: jnp.ndarray,
) -> jnp.ndarray:
    """extend_attention over an int8 KV cache (decode_attention_quant's
    post-dot scale trick, generalized to C queries with per-query causal
    masks)."""
    n_rep = q.shape[2] // k_q.shape[2]
    k = _repeat_kv(k_q.astype(q.dtype), n_rep)
    v = _repeat_kv(v_q.astype(q.dtype), n_rep)
    ks = jnp.moveaxis(_repeat_kv(k_s, n_rep), (1, 2, 3), (3, 1, 2))
    vs = jnp.moveaxis(_repeat_kv(v_s, n_rep), (1, 2, 3), (3, 1, 2))
    d = q.shape[-1]
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * ks.astype(jnp.float32) * (d ** -0.5)
    pos = jnp.arange(k.shape[1])[None, None, None, :]
    qpos = (c0 + jnp.arange(q.shape[1])).reshape(1, 1, -1, 1)
    logits = jnp.where(pos <= qpos, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    probs = (probs * vs.astype(jnp.float32)).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def quantize_kv(x: jnp.ndarray):
    """[..., D] -> (int8 values, f32 scale [..., 1]); symmetric absmax per
    leading index (per token per head for cache writes)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True), 1e-6) / 127.0
    return jnp.round(xf / s).astype(jnp.int8), s
