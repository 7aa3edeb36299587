"""int4 (deinterleaved-halves) matmul as a Pallas TPU kernel.

y = x @ dequant(w) with w nibble-packed int8 in the "half" layout
(utils/quantize._quantize_kernel4h: logical rows [0, K/2) in the low
nibble, [K/2, K) in the high nibble, groupwise scales). The packed bytes
stream HBM->VMEM once (0.5 bytes/weight — HALF the int8 kernel's weight
traffic) and the unpack (two arithmetic shifts) + group-scale multiply
happen in-register before the MXU dot.

This is the sibling of ops/pallas/int8_matmul for the int4 capacity
config (reference bnb NF4 scope, /root/reference/chat.py:94-100): used by
the pack_inference wide kernels (models/llama.py packed branches), where
XLA would otherwise materialize the dequantized bf16 copy. Plain stacked
(layer-scan) int4h linears stay on the XLA grouped-dot composition in
utils/quantize.int4h_matmul* — measured round 2: pallas_call operands
inside a scan body become slice copies that forfeit the traffic win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref, *, transposed: bool, groups: int):
    x = x_ref[...]                      # [bm, K] activation block
    p = w_ref[...]                      # packed [K/2, bn] or [bn, K/2]
    s = s_ref[...].astype(jnp.float32)  # [G, 1, bn] or [G, bn, 1]
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    gh = groups // 2  # scale groups per nibble half

    def scaled(q, s_half, axis_k):
        # q [K/2, bn] (or [bn, K/2]); s_half [gh, 1, bn] (or [gh, bn, 1])
        w = q.astype(jnp.float32)
        if axis_k == 0:
            k2, bn = w.shape
            w = w.reshape(gh, k2 // gh, bn) * s_half
            return w.reshape(k2, bn)
        bn, k2 = w.shape
        w = (w.reshape(bn, gh, k2 // gh) *
             jnp.moveaxis(s_half, 0, 1))  # [bn, gh, 1]
        return w.reshape(bn, k2)

    axis_k = 1 if transposed else 0
    w_lo = scaled(lo, s[:gh], axis_k)
    w_hi = scaled(hi, s[gh:], axis_k)
    k2 = x.shape[1] // 2
    x32 = x.astype(jnp.float32)
    if transposed:
        acc = jax.lax.dot_general(
            x32[:, :k2], w_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(
            x32[:, k2:], w_hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        acc = jnp.dot(x32[:, :k2], w_lo,
                      preferred_element_type=jnp.float32)
        acc += jnp.dot(x32[:, k2:], w_hi,
                       preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _matmul(x2d: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
            transposed: bool, block_m: int = 256,
            block_n: int = 512) -> jnp.ndarray:
    """x2d [M, K] @ dequant(w packed). w: [K/2, N] + scale [G, 1, N], or
    [N, K/2] + scale [G, N, 1] when transposed."""
    m, k = x2d.shape
    n = w.shape[0] if transposed else w.shape[1]
    groups = scale.shape[0]
    bm = min(block_m, max(8, m))
    bn = min(block_n, n)

    def vmem(bm_, bn_):
        # x double-buffered bf16/f32, packed w int8, unpacked f32 lo+hi,
        # f32 acc
        return 2 * bm_ * k * 4 + 2 * (k // 2) * bn_ + k * bn_ * 4 \
            + bm_ * bn_ * 4
    BUDGET = 12 * 1024 * 1024
    while vmem(bm, bn) > BUDGET and bm > 64:
        bm //= 2
    while vmem(bm, bn) > BUDGET and bn > 128:
        bn //= 2

    m_pad = -m % bm
    if m_pad:
        x2d = jnp.pad(x2d, ((0, m_pad), (0, 0)))
    mp = m + m_pad
    n_pad = -n % bn
    if n_pad:
        if transposed:
            w = jnp.pad(w, ((0, n_pad), (0, 0)))
            scale = jnp.pad(scale, ((0, 0), (0, n_pad), (0, 0)))
        else:
            w = jnp.pad(w, ((0, 0), (0, n_pad)))
            scale = jnp.pad(scale, ((0, 0), (0, 0), (0, n_pad)))
    np_ = n + n_pad

    if transposed:
        w_spec = pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((groups, bn, 1), lambda i, j: (0, j, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((k // 2, bn), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((groups, 1, bn), lambda i, j: (0, 0, j),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, transposed=transposed, groups=groups),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            s_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=(x2d.size * x2d.dtype.itemsize + w.size
                            + mp * np_ * 2),
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x2d, w, scale)
    return out[:m, :n]


def int4h_matmul_pallas(x: jnp.ndarray, w_q: jnp.ndarray,
                        scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant(w_q [K/2, N], scale4h [G, 1, N])."""
    lead = x.shape[:-1]
    y = _matmul(x.reshape(-1, x.shape[-1]), w_q, scale, transposed=False)
    return y.reshape(lead + (y.shape[-1],))


def int4h_matmul_t_pallas(x: jnp.ndarray, w_q: jnp.ndarray,
                          scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant(w_q [N, K/2], scale4h [G, N, 1]).T."""
    lead = x.shape[:-1]
    y = _matmul(x.reshape(-1, x.shape[-1]), w_q, scale, transposed=True)
    return y.reshape(lead + (y.shape[-1],))
