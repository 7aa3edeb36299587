"""Weight-only int8 matmul as a Pallas TPU kernel.

y = x @ dequant(w) with w stored int8 + per-output-channel scales
(utils/quantize.py layout). XLA fuses the dequant into narrow matmuls, but
for the WIDE packed kernels (models/llama.py pack_inference: qkv [3H, H],
gateup [H, 2I]) it materializes a full bf16 copy of the dequantized weight
in HBM — 3-6 GB of traffic per forward at 7B, an OOM at batch 12. This
kernel streams the int8 blocks through VMEM and dequantizes in-register, so
HBM only ever sees int8 weight bytes.

Used by models/llama.py's packed branches (pack_inference trees); plain
(unpacked) int8 linears stay on the XLA path, which is already at roofline
for them. At 7B on a 16G-HBM v5e the packed+int8 combination still exceeds
HBM at batch >= 8 (the wide [T, 3H]/[T, 2I] outputs materialize at the
kernel boundary instead of fusing into consumers) — packing is for bf16
serving there; this kernel pays off on larger-HBM parts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref, *, transposed: bool):
    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)
    scale = s_ref[...].astype(jnp.float32)
    if transposed:  # w block [bn, K], scale [bn, 1]
        acc = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * scale.reshape(1, -1)
    else:  # w block [K, bn], scale [1, bn]
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
        acc = acc * scale
    o_ref[...] = acc.astype(o_ref.dtype)


def _matmul(x2d: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
            transposed: bool, block_m: int = 256,
            block_n: int = 512) -> jnp.ndarray:
    # block VMEM budget (double-buffered): x 2*bm*K*2B + w 2*K*bn*1B
    # + out/acc ~ bm*bn*6B; (256, 512) at K=4096 is ~9.5MB of the 16MB limit
    """x2d [M, K] @ dequant(w) -> [M, N]. w: [K, N] (or [N, K] transposed,
    scale [N, 1] instead of [1, N])."""
    m, k = x2d.shape
    n = w.shape[0] if transposed else w.shape[1]
    bm = min(block_m, max(8, m))
    bn = min(block_n, n)
    # VMEM budget (double-buffered pipeline): x 2*bm*k*2B, w 2*k*bn*1B,
    # out/acc bm*bn*6B — shrink blocks until it fits (K=11008 mlp kernels
    # blow the (256, 512) default that was sized for K=4096)
    def vmem(bm_, bn_):
        return 2 * bm_ * k * 2 + 2 * k * bn_ + bm_ * bn_ * 6
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
    if n_pad:  # pad output channels like rows (zero scale -> zero output)
        if transposed:
            w = jnp.pad(w, ((0, n_pad), (0, 0)))
            scale = jnp.pad(scale, ((0, n_pad), (0, 0)))
        else:
            w = jnp.pad(w, ((0, 0), (0, n_pad)))
            scale = jnp.pad(scale, ((0, 0), (0, n_pad)))
    np_ = n + n_pad

    if transposed:
        w_spec = pl.BlockSpec((bn, k), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((bn, 1), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((k, bn), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, bn), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, transposed=transposed),
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
            flops=2 * mp * n * k,
            bytes_accessed=x2d.size * x2d.dtype.itemsize + w.size + n * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2d, w, scale)
    return out[:m, :n]


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant(w_q [K, N], scale [1, N]) -> [..., N]."""
    lead = x.shape[:-1]
    y = _matmul(x.reshape(-1, x.shape[-1]), w_q, scale, transposed=False)
    return y.reshape(lead + (y.shape[-1],))


def int8_matmul_t(x: jnp.ndarray, w_q: jnp.ndarray,
                  scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant(w_q [N, K], scale [N, 1]).T -> [..., N]
    (the transposed 'decode-major' kernel storage)."""
    lead = x.shape[:-1]
    y = _matmul(x.reshape(-1, x.shape[-1]), w_q, scale, transposed=True)
    return y.reshape(lead + (y.shape[-1],))


# ---------------------------------------------------------------------------
# Fused W8A8 (dynamic activation quant) matmul
# ---------------------------------------------------------------------------
# The XLA composition of W8A8 (quantize x -> s8xs8 dot -> rescale) leaves
# most of the 2x int8-MXU rate on the table: the int32 [M, N] product
# round-trips HBM before the f32 rescale. This kernel K-blocks the
# contraction with an int32 VMEM accumulator and applies the
# (row_scale * col_scale) epilogue before the bf16 store, so the product
# never touches HBM in int32. Activations are quantized by XLA outside
# (per-row symmetric absmax; x_q is K bytes/row — negligible traffic) —
# in-kernel quantization would recompute the row absmax per n-block.
#
# History: a first version without K-blocking was 3x SLOWER than bf16 at
# K=11008 — the VMEM budget forced bm<=128, so the weights re-streamed
# once per tiny m-block. K-blocking frees the block sizes from K.


def _w8a8_kernel(x_ref, w_ref, as_ref, ws_ref, o_ref, acc_ref,
                 *, n_kb: int, transposed: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xq = x_ref[...]                                       # [bm, bk] int8
    if transposed:  # w block [bn, bk]
        acc_ref[...] += jax.lax.dot_general(
            xq, w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    else:           # w block [bk, bn]
        acc_ref[...] += jax.lax.dot(xq, w_ref[...],
                                    preferred_element_type=jnp.int32)

    @pl.when(kk == n_kb - 1)
    def _finalize():
        a_s = as_ref[...].astype(jnp.float32)             # [bm, 1]
        w_s = ws_ref[...].astype(jnp.float32)
        if transposed:
            w_s = w_s.reshape(1, -1)
        o_ref[...] = (acc_ref[...].astype(jnp.float32) * a_s * w_s
                      ).astype(o_ref.dtype)


def _pick_bk(k: int, cap: int = 8192) -> int:
    """Largest 128-multiple divisor of k (<= cap): K blocks must tile K
    exactly and be lane-aligned. 4096 -> 4096, 11008 -> 5504."""
    for mult in range(min(cap, k) // 128, 0, -1):
        if k % (128 * mult) == 0:
            return 128 * mult
    return k


def _w8a8(x2d: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
          transposed: bool, block_m: int = 512,
          block_n: int = 512) -> jnp.ndarray:
    m, k = x2d.shape
    n = w.shape[0] if transposed else w.shape[1]

    # XLA-side dynamic activation quantization (fuses into one pass)
    xf = x2d.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    a_scale = jnp.maximum(absmax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)

    bk = _pick_bk(k)
    n_kb = k // bk
    bm = min(block_m, max(8, m))
    bn = min(block_n, n)

    def vmem(bm_, bn_):
        # x_q + w int8 double-buffered, int32 acc + f32 epilogue
        return 2 * bm_ * bk + 2 * bk * bn_ + bm_ * bn_ * 8
    BUDGET = 12 * 1024 * 1024
    while vmem(bm, bn) > BUDGET and bm > 64:
        bm //= 2
    while vmem(bm, bn) > BUDGET and bn > 128:
        bn //= 2

    m_pad = -m % bm
    if m_pad:
        x_q = jnp.pad(x_q, ((0, m_pad), (0, 0)))
        a_scale = jnp.pad(a_scale, ((0, m_pad), (0, 0)))
    mp = m + m_pad
    n_pad = -n % bn
    if n_pad:
        if transposed:
            w = jnp.pad(w, ((0, n_pad), (0, 0)))
            scale = jnp.pad(scale, ((0, n_pad), (0, 0)))
        else:
            w = jnp.pad(w, ((0, 0), (0, n_pad)))
            scale = jnp.pad(scale, ((0, 0), (0, n_pad)))
    np_ = n + n_pad

    if transposed:
        w_spec = pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((bn, 1), lambda i, j, kk: (j, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_w8a8_kernel, n_kb=n_kb, transposed=transposed),
        grid=(mp // bm, np_ // bn, n_kb),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=x_q.size + w.size + mp * np_ * 2,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(x_q, w, a_scale, scale)
    return out[:m, :n]


def w8a8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] (float) @ dequant(w_q [K, N]) via fused dynamic W8A8."""
    lead = x.shape[:-1]
    y = _w8a8(x.reshape(-1, x.shape[-1]), w_q, scale, transposed=False)
    return y.reshape(lead + (y.shape[-1],))


def w8a8_matmul_t(x: jnp.ndarray, w_q: jnp.ndarray,
                  scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant(w_q [N, K], scale [N, 1]).T via fused W8A8."""
    lead = x.shape[:-1]
    y = _w8a8(x.reshape(-1, x.shape[-1]), w_q, scale, transposed=True)
    return y.reshape(lead + (y.shape[-1],))
