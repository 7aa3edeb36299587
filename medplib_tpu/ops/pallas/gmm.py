"""Grouped matmul (megablox-style `gmm`) for zero-padding MoE experts.

y[rows of group g] = x[rows of group g] @ w[g] — tokens pre-sorted by
expert and each group's rows PADDED UP to the m-tile size (group-aligned
layout), so every m-tile belongs to exactly one expert. The expert id per
tile rides as a scalar-prefetch operand and steers the weight BlockSpec:
each tile streams only ITS expert's [bk, bn] weight blocks through VMEM.

This is what makes top-1 MoE prefill cost ~S token-slots of FFN compute:
the capacity-dispatch einsum/sort formulations must pad every expert to
`capacity` slots (eval capacity 2.0 -> 2S slots, half of it padding), and
jax.lax.ragged_dot measured 22 TF/s on v5e-axon (a masked lowering, 3x
slower than even the padded path). Alignment waste here is at most
E * (bm - 1) rows — for the flagship (E=2, bm=512) ~0.02% of a prefill.

Weights: bf16/f32 [E, K, N], or int8 [E, K, N] + per-channel scale
[E, 1, N] (dequant fused at the epilogue). The int4h layout dequantizes
per layer OUTSIDE the kernel (a one-layer bf16 expert copy, ~360 MB
transient at 7B — the FLOP savings dwarf its traffic).

Used by ops/moe.moe_mlp(dispatch_mode="gmm"). Reference scope:
deepspeed MoE inference path, medplib_moe_llama.py:602-614.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(gid_ref, x_ref, w_ref, s_ref, as_ref, o_ref, acc_ref,
            *, n_kb: int, int8_w: bool, int8_x: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = w_ref[0]                       # [bk, bn] (leading expert dim is 1)
    if int8_x:                          # W8A8: s8 x s8 -> s32 on the MXU,
        acc_ref[...] += jax.lax.dot(    # accumulated in VMEM (never HBM)
            x, w, preferred_element_type=jnp.int32)
    elif int8_w:
        acc_ref[...] += jax.lax.dot(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32)
    else:
        acc_ref[...] += jax.lax.dot(x, w,
                                    preferred_element_type=jnp.float32)

    @pl.when(kk == n_kb - 1)
    def _fin():
        acc = acc_ref[...].astype(jnp.float32)
        if int8_w:
            acc = acc * s_ref[0].astype(jnp.float32)  # [1, bn] per-channel
        if int8_x:
            acc = acc * as_ref[...].astype(jnp.float32)  # [bm, 1] per-row
        o_ref[...] = acc.astype(o_ref.dtype)


def _pick_bk(k: int, cap: int = 2048):
    """Largest lane-aligned K block <= cap; pads K up to a 1024 multiple
    when its divisor structure only allows tiny blocks (11008 -> bk 256;
    padded 11264 -> bk 1024, fewer accumulate iterations)."""
    def best(kk):
        for mult in range(min(cap, kk) // 128, 0, -1):
            if kk % (128 * mult) == 0:
                return 128 * mult
        return kk
    bk = best(k)
    if bk < 1024:
        k_pad = -k % 1024
        return 1024, k_pad
    return bk, 0


def gmm(x: jnp.ndarray, w: jnp.ndarray, tile_gid: jnp.ndarray,
        w_scale: jnp.ndarray | None = None,
        a_scale: jnp.ndarray | None = None, block_m: int = 512,
        block_n: int = 512, out_dtype=None) -> jnp.ndarray:
    """x [Sp, K] group-aligned rows; w [E, K, N] (+ optional int8 scale
    [E, 1, N]); tile_gid [Sp // block_m] int32 expert id per m-tile.
    With a_scale [Sp, 1], x must be int8 (W8A8: per-row activation scales
    applied at the epilogue). Sp must be a multiple of block_m.
    -> [Sp, N]."""
    sp, k = x.shape
    e, _, n = w.shape
    assert sp % block_m == 0 and tile_gid.shape == (sp // block_m,)
    bm = block_m
    bn = min(block_n, n)
    bk, k_pad = _pick_bk(k)
    if k_pad:
        x = jnp.pad(x, ((0, 0), (0, k_pad)))
        w = jnp.pad(w, ((0, 0), (0, k_pad), (0, 0)))
    kp = k + k_pad
    int8_w = w.dtype == jnp.int8
    int8_x = x.dtype == jnp.int8
    if out_dtype is None:
        out_dtype = jnp.bfloat16 if int8_x else x.dtype
    if w_scale is None:
        w_scale = jnp.ones((e, 1, n), jnp.float32)
    if a_scale is None:
        a_scale = jnp.ones((sp, 1), jnp.float32)

    n_pad = -n % bn
    if n_pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, n_pad)))
        w_scale = jnp.pad(w_scale, ((0, 0), (0, 0), (0, n_pad)))
    np_ = n + n_pad
    n_kb = kp // bk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sp // bm, np_ // bn, n_kb),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk, gid: (i, kk)),
            pl.BlockSpec((1, bk, bn), lambda i, j, kk, gid: (gid[i], kk, j)),
            pl.BlockSpec((1, 1, bn), lambda i, j, kk, gid: (gid[i], 0, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk, gid: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, gid: (i, j)),
        scratch_shapes=[pltpu.VMEM(
            (bm, bn), jnp.int32 if int8_x else jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_kb=n_kb, int8_w=int8_w, int8_x=int8_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sp, np_), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * sp * np_ * kp,
            bytes_accessed=x.size * x.dtype.itemsize
            + (sp // bm) * kp * bn * w.dtype.itemsize + sp * np_ * 2,
            transcendentals=0),
        interpret=jax.default_backend() != "tpu",
    )(tile_gid, x, w, w_scale, a_scale)
    return out[:, :n]


def quantize_rows(x: jnp.ndarray):
    """Per-row symmetric int8 activation quant for the W8A8 gmm path.
    [Sp, K] -> (int8 [Sp, K], f32 scales [Sp, 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True), 1e-12) / 127.0
    return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s


def align_groups(xs_sorted: jnp.ndarray, ranks: jnp.ndarray,
                 sorted_expert: jnp.ndarray, group_sizes: jnp.ndarray,
                 num_experts: int, block_m: int):
    """Scatter expert-sorted tokens into a group-ALIGNED buffer: group g
    occupies rows [aligned_offs[g], aligned_offs[g] + size_g) where every
    aligned_offs is a multiple of block_m (gap rows stay zero).

    xs_sorted [S, K]; ranks [S] position within the token's group;
    sorted_expert [S]. -> (x_aligned [Sp, K], dest [S] row ids,
    tile_gid [Sp // block_m])."""
    s = xs_sorted.shape[0]
    sp = (s // block_m + num_experts) * block_m  # static worst case
    aligned = ((group_sizes + block_m - 1) // block_m) * block_m
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(aligned.astype(jnp.int32))[:-1]])
    dest = offs[sorted_expert] + ranks
    x_al = jnp.zeros((sp, xs_sorted.shape[1]), xs_sorted.dtype
                     ).at[dest].set(xs_sorted)
    # expert id per m-tile: number of groups fully BEFORE the tile start
    ends = jnp.cumsum(aligned.astype(jnp.int32))
    tile_start = jnp.arange(sp // block_m, dtype=jnp.int32) * block_m
    tile_gid = jnp.sum(tile_start[:, None] >= ends[None, :],
                       axis=1).astype(jnp.int32)
    tile_gid = jnp.minimum(tile_gid, num_experts - 1)  # tail tiles: no-ops
    return x_al, dest, tile_gid
