"""Blockwise flash attention (forward) as a Pallas TPU kernel.

TPU-native counterpart of the reference's CUDA flash-attn dependency
(/root/reference/model/medplib/train/llama_flash_attn_monkey_patch.py) and
its vendored Triton kernel (mpt/flash_attn_triton.py) — written fresh for the
MXU: the kernel streams K/V blocks through VMEM with an online-softmax
accumulator so the [T, S] logit matrix never materializes in HBM.

Causal blocks below the diagonal skip masking entirely; blocks strictly above
the diagonal are skipped by bounding the kv loop per q block. Gradients take
a recompute path through the XLA attention (flash is used for inference
prefill; training lengths in MedPLIB are <= 2048 where XLA's fused attention
is already at roofline).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.3819763e38


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref,
                  *, block_k: int, kv_len: int, q_offset: int, scale: float,
                  has_mask: bool):
    """Grid: (BH, num_q_blocks). Blocks: q/o [1, block_q, D], k/v [1, kv_len, D]
    (K/V for this batch-head stay in VMEM; fine for S <= 8k at D=128)."""
    qi = pl.program_id(1)
    block_q = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32) * scale  # [Bq, D]

    q_start = qi * block_q + q_offset  # absolute kv-index of first query row
    # kv blocks needed: all k with index <= q_start + block_q - 1
    num_kv_blocks = pl.cdiv(kv_len, block_k)
    needed = jnp.minimum(
        (q_start + block_q + block_k - 1) // block_k, num_kv_blocks)

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(ki * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [Bq, Bk]

        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + q_start
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        keep = jnp.logical_and(rows >= cols, cols < kv_len)
        if has_mask:
            pad = mask_ref[0, 0, pl.ds(ki * block_k, block_k)]  # [Bk] int32
            keep = jnp.logical_and(keep, (pad > 0)[None, :])
        s = jnp.where(keep, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, q_ref.shape[2]), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, needed, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, attn_mask, block_q: int, block_k: int):
    """q [B,T,H,D], k/v [B,S,H,D] (heads already repeated), mask [B,S] or None."""
    b, t, h, d = q.shape
    s = k.shape[1]
    q_bhtd = jnp.moveaxis(q, 2, 1).reshape(b * h, t, d)
    k_bhtd = jnp.moveaxis(k, 2, 1).reshape(b * h, s, d)
    v_bhtd = jnp.moveaxis(v, 2, 1).reshape(b * h, s, d)

    t_pad = -t % block_q
    if t_pad:
        q_bhtd = jnp.pad(q_bhtd, ((0, 0), (0, t_pad), (0, 0)))
    tp = t + t_pad
    s_pad = -s % block_k
    if s_pad:
        k_bhtd = jnp.pad(k_bhtd, ((0, 0), (0, s_pad), (0, 0)))
        v_bhtd = jnp.pad(v_bhtd, ((0, 0), (0, s_pad), (0, 0)))
    sp = s + s_pad

    has_mask = attn_mask is not None
    if has_mask:
        mask = jnp.repeat(attn_mask.astype(jnp.int32), h, axis=0)
        if s_pad:
            mask = jnp.pad(mask, ((0, 0), (0, s_pad)))
        mask = mask[:, None, :]  # [BH, 1, S] so the block tile is 2D-aligned
    else:
        mask = jnp.zeros((b * h, 1, sp), jnp.int32)

    grid = (b * h, tp // block_q)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, kv_len=s, q_offset=s - t,
        scale=d ** -0.5, has_mask=has_mask)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, sp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * s * d,
            bytes_accessed=(q.size + 2 * k.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * t * s,
        ),
        interpret=jax.default_backend() != "tpu",
    )(mask, q_bhtd, k_bhtd, v_bhtd)
    out = out[:, :t].reshape(b, h, t, d)
    return jnp.moveaxis(out, 1, 2)


def _xla_reference(q, k, v, attn_mask):
    from medplib_tpu.ops.attention import _xla_attention, make_causal_bias
    bias = make_causal_bias(attn_mask, q.shape[1], k.shape[1])
    return _xla_attention(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_vjp(q, k, v, attn_mask, causal, block_sizes):
    # attn_mask is a traced int array -> it must be a REGULAR custom_vjp
    # argument (nondiff_argnums is only for non-tracer static values); its
    # cotangent is the symbolic-zero float0.
    bq, bk = block_sizes
    return _flash_forward(q, k, v, attn_mask, min(bq, max(q.shape[1], 8)),
                          min(bk, k.shape[1]))


def _fwd(q, k, v, attn_mask, causal, block_sizes):
    out = _flash_vjp(q, k, v, attn_mask, causal, block_sizes)
    return out, (q, k, v, attn_mask)


def _bwd(causal, block_sizes, res, g):
    q, k, v, attn_mask = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, attn_mask),
                     q, k, v)
    dmask = np.zeros(attn_mask.shape, jax.dtypes.float0)
    return vjp(g) + (dmask,)


_flash_vjp.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,
    causal: bool = True,
    block_sizes: tuple = (512, 512),
) -> jnp.ndarray:
    assert causal, "only causal supported"
    if attn_mask is None:
        # all-ones mask keeps the custom_vjp (and thus differentiability)
        # on the mask-less path; per-block mask loads are negligible
        attn_mask = jnp.ones((q.shape[0], k.shape[1]), jnp.int32)
    return _flash_vjp(q, k, v, attn_mask.astype(jnp.int32), causal,
                      block_sizes)
