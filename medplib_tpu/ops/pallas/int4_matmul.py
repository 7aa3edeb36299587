"""int4 (interleaved-pairs) matmul as a Pallas TPU kernel.

y = x @ dequant(w) with w nibble-packed int8 in the pairs layout
(utils/quantize._quantize_kernel4h: logical rows 2r / 2r+1 in packed row
r's lo/hi nibbles — the hardware bitcast's nibble order). The packed
bytes stream HBM->VMEM once (0.5 bytes/weight — HALF the int8 kernel's
weight traffic); the normal layout unpacks to natural row order in ONE
`pltpu.bitcast` and dots once, the transposed layout (packed along its
LAST axis, which bitcast cannot widen) keeps the shift unpack and pairs
the nibble planes with even/odd activation columns prepared outside.

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


def _expand_group_scales(s, groups: int, shape, group_axis: int):
    """Broadcast per-group scales to a full [rows, cols] factor by
    iota-compare selection (Mosaic rejects the lane/sublane-splitting
    reshape (R, C) -> (R, G, C/G); G selects over a broadcasted iota
    lower fine and this kernel is not traffic-bound). s: [G] slices each
    broadcastable to `shape`; group id = index along `group_axis` //
    (extent / G)."""
    per = shape[group_axis] // groups
    gid = jax.lax.broadcasted_iota(jnp.int32, shape, group_axis) // per
    out = jnp.zeros(shape, jnp.float32)
    for g in range(groups):
        out = jnp.where(gid == g, s[g], out)
    return out


def _kernel(x_ref, w_ref, s_ref, o_ref, *, groups: int, interpret: bool):
    from medplib_tpu.ops.pallas.gmm import unpack_pairs
    x = x_ref[...]                      # [bm, K] activation block
    p = w_ref[...]                      # packed [K/2, bn]
    s = s_ref[...].astype(jnp.float32)  # [G, 1, bn]
    w = unpack_pairs(p, interpret).astype(jnp.float32)   # [K, bn] natural
    # groupwise dequant on contiguous logical rows, then ONE dot
    w = w * _expand_group_scales(s, groups, w.shape, 0)
    acc = jnp.dot(x.astype(jnp.float32), w,
                  preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_t(x_ref, w_ref, s_ref, o_ref, *, groups: int):
    # transposed: packed along the LAST axis (bitcast widens only dim -2),
    # so unpack stays two shift chains; the nibble PLANES pair with the
    # even/odd activation columns stacked outside ([2, bm, K/2])
    x_even, x_odd = x_ref[0], x_ref[1]  # [bm, K/2] each
    p = w_ref[...]                      # packed [bn, K/2]
    s = s_ref[...].astype(jnp.float32)  # [G, bn, 1]
    # i32 shifts: Mosaic legalizes vector shifts at neither i8 nor i16
    # (arith.shli on vector<..xi8> fails — this kernel had shifted at i8
    # and could never have compiled on hardware before round 5)
    p32 = p.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)
    # both nibble planes of a packed column share its scale group
    sf = _expand_group_scales(s, groups, p.shape, 1)

    acc = jax.lax.dot_general(
        x_even.astype(jnp.float32), lo.astype(jnp.float32) * sf,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        x_odd.astype(jnp.float32), hi.astype(jnp.float32) * sf,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
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

    interpret = jax.default_backend() != "tpu"
    if transposed:
        # parity-stacked activations: even/odd logical columns pair with
        # the lo/hi nibble planes (one strided copy, outside the kernel)
        xs = jnp.stack([x2d[:, 0::2], x2d[:, 1::2]])     # [2, M, K/2]
        w_spec = pl.BlockSpec((bn, k // 2), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((groups, bn, 1), lambda i, j: (0, j, 0),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(_kernel_t, groups=groups)
        x_spec = pl.BlockSpec((2, bm, k // 2), lambda i, j: (0, i, 0),
                              memory_space=pltpu.VMEM)
        x_in = xs
    else:
        w_spec = pl.BlockSpec((k // 2, bn), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((groups, 1, bn), lambda i, j: (0, 0, j),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(_kernel, groups=groups,
                                 interpret=interpret)
        x_spec = pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
        x_in = x2d

    out = pl.pallas_call(
        kern,
        grid=(mp // bm, np_ // bn),
        in_specs=[x_spec, w_spec, s_spec],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=(x2d.size * x2d.dtype.itemsize + w.size
                            + mp * np_ * 2),
            transcendentals=0),
        interpret=interpret,
    )(x_in, w, scale)
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
