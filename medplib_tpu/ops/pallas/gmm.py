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
[E, 1, N] (dequant fused at the epilogue), or — via `gmm_int4h` — the
int4 interleaved-pairs layout [E, K/2, N] packed + per-half scales
[E, 2, 1, N]: each packed block DMAs once at 0.5 byte/weight and unpacks
to natural logical row order in ONE hardware op (`pltpu.bitcast(int4)` —
the pairs packing exists to match its nibble order; the prior
deinterleaved-halves layout needed two i32 shift chains per plane, the
dominant VPU cost of the int4 decode path), so expert residency is half
of int8's — what lets the full 32L x 2e flagship run at batch sizes int8
experts cannot fit. int4h stacks with finer-grained scales (G > 2) fall
back to the per-layer outside-dequant bf16 path in ops/moe._gmm_moe.

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
            *, n_kb: int, int8_w: bool, int8_x: bool, trans_w: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = w_ref[0]    # [bk, bn], or [bn, bk] for transposed ("decode-major"
    #                 [out, in] q/k/v storage — contracted on dim 1 of both)
    dims = (((1,), (1,)), ((), ())) if trans_w else (((1,), (0,)), ((), ()))
    if int8_x:                          # W8A8: s8 x s8 -> s32 on the MXU,
        acc_ref[...] += jax.lax.dot_general(  # accumulated in VMEM
            x, w, dims, preferred_element_type=jnp.int32)
    elif int8_w:
        acc_ref[...] += jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), dims,
            preferred_element_type=jnp.float32)
    else:
        acc_ref[...] += jax.lax.dot_general(
            x, w, dims, preferred_element_type=jnp.float32)

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
        block_n: int = 512, out_dtype=None,
        allow_pad: bool = True, block_k: int | None = None,
        transposed: bool = False) -> jnp.ndarray:
    """x [Sp, K] group-aligned rows; w [E, K, N] (+ optional int8 scale
    [E, 1, N]); tile_gid [Sp // block_m] int32 expert id per m-tile.
    With a_scale [Sp, 1], x must be int8 (W8A8: per-row activation scales
    applied at the epilogue). Sp must be a multiple of block_m.
    -> [Sp, N].

    transposed=True: w is [E, N, K] ("decode-major" [out, in] q/k/v
    storage, models/llama.init_layer) contracted on its LAST axis —
    w_scale stays channel-last [E, 1, N] (callers swap the stored
    [.., N, 1] scale axes once outside). This is what lets the stacked
    attention-projection path stream the stored stacks without a whole-
    stack relayout copy.

    allow_pad=False forbids the internal K/N zero-padding copies of `w`:
    the whole-stack layer-indexed path (models/moe_llama) passes ALL
    layers' experts as ONE [L*E, K, N] operand riding the layer scan —
    padding that inside the scan would copy the full multi-GB stack every
    layer, so those trees are stored pre-padded
    (utils/quantize.pad_moe_experts_for_gmm) and a shape that would still
    need padding is a caller bug."""
    sp, k = x.shape
    if transposed:
        e, n, _ = w.shape
    else:
        e, _, n = w.shape
    assert sp % block_m == 0 and tile_gid.shape == (sp // block_m,)
    bm = block_m
    bn = min(block_n, n)
    if block_k is not None and k % block_k == 0:
        bk, k_pad = block_k, 0
    else:
        bk, k_pad = _pick_bk(k)
    if not allow_pad and k_pad:
        # never pad the (possibly whole-stack) weight operand: fall back
        # to the largest dividing block even if it is small
        bk, k_pad = _best_block(k), 0
    if k_pad:
        x = jnp.pad(x, ((0, 0), (0, k_pad)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, k_pad)) if transposed
                    else ((0, 0), (0, k_pad), (0, 0)))
    kp = k + k_pad
    int8_w = w.dtype == jnp.int8
    int8_x = x.dtype == jnp.int8
    if out_dtype is None:
        out_dtype = jnp.bfloat16 if int8_x else x.dtype
    if w_scale is None:
        w_scale = jnp.ones((e, 1, n), jnp.float32)
    assert w_scale.shape == (e, 1, n), \
        "w_scale must be channel-last [E, 1, N] (transposed callers swap)"
    if a_scale is None:
        a_scale = jnp.ones((sp, 1), jnp.float32)

    n_pad = -n % bn
    assert allow_pad or n_pad == 0, \
        f"no-pad gmm needs N % {bn} == 0, got N={n} (pre-pad the stack)"
    if n_pad:
        w = jnp.pad(w, ((0, 0), (0, n_pad), (0, 0)) if transposed
                    else ((0, 0), (0, 0), (0, n_pad)))
        w_scale = jnp.pad(w_scale, ((0, 0), (0, 0), (0, n_pad)))
    np_ = n + n_pad
    n_kb = kp // bk

    if transposed:
        w_spec = pl.BlockSpec((1, bn, bk), lambda i, j, kk, gid: (gid[i], j, kk))
    else:
        w_spec = pl.BlockSpec((1, bk, bn), lambda i, j, kk, gid: (gid[i], kk, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sp // bm, np_ // bn, n_kb),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk, gid: (i, kk)),
            w_spec,
            pl.BlockSpec((1, 1, bn), lambda i, j, kk, gid: (gid[i], 0, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk, gid: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, gid: (i, j)),
        scratch_shapes=[pltpu.VMEM(
            (bm, bn), jnp.int32 if int8_x else jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_kb=n_kb, int8_w=int8_w, int8_x=int8_x,
                          trans_w=transposed),
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


def unpack_pairs(p: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """Packed int8 [R, C] (pairs layout: logical rows 2r / 2r+1 in packed
    row r's lo/hi nibbles, utils/quantize._quantize_kernel4h) -> int8
    [2R, C] logical rows in NATURAL order. On TPU this is ONE hardware
    narrowing bitcast (probe-verified row order: lo of row r, then hi);
    the interpret path (CPU tests) reproduces the same order with shifts
    + interleave (perf-irrelevant there)."""
    if not interpret:
        return pltpu.bitcast(p, jnp.int4).astype(jnp.int8)
    p32 = p.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.int8)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    r, c = p.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * r, c)


def _kernel_int4h(gid_ref, x_ref, p_ref, s_ref, as_ref, o_ref,
                  acc_lo_ref, acc_hi_ref, *, n_kb: int, kb_lo: int,
                  single: bool, int8_x: bool, interpret: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_lo_ref[...] = jnp.zeros_like(acc_lo_ref)
        acc_hi_ref[...] = jnp.zeros_like(acc_hi_ref)

    w = unpack_pairs(p_ref[0], interpret)    # [2*bk, bn] natural rows
    x = x_ref[...]                           # [bm, 2*bk] logical columns
    bf = jnp.bfloat16

    def dot(a, b):
        if int8_x:                           # W4A8 on the int8 MXU
            return jax.lax.dot(a, b, preferred_element_type=jnp.int32)
        return jax.lax.dot(a.astype(bf), b.astype(bf),
                           preferred_element_type=jnp.float32)

    if single:
        # one K block spans both scale groups: slice at the (sublane-
        # aligned) group boundary and accumulate each half separately
        k2 = w.shape[0] // 2
        acc_lo_ref[...] += dot(x[:, :k2], w[:k2])
        acc_hi_ref[...] += dot(x[:, k2:], w[k2:])
    else:
        # blocks never straddle the boundary (bk | K/4 by construction):
        # the whole block belongs to group (kk >= kb_lo)
        d = dot(x, w)

        @pl.when(kk < kb_lo)
        def _lo():
            acc_lo_ref[...] += d

        @pl.when(kk >= kb_lo)
        def _hi():
            acc_hi_ref[...] += d

    @pl.when(kk == n_kb - 1)
    def _fin():
        # per-half (group x channel) scales at the epilogue — the int32/f32
        # partial products never touch HBM
        acc = (acc_lo_ref[...].astype(jnp.float32)
               * s_ref[0, 0, 0].astype(jnp.float32)
               + acc_hi_ref[...].astype(jnp.float32)
               * s_ref[0, 1, 0].astype(jnp.float32))
        if int8_x:
            acc = acc * as_ref[...].astype(jnp.float32)   # [bm, 1] per-row
        o_ref[...] = acc.astype(o_ref.dtype)


def gmm_int4h(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
              tile_gid: jnp.ndarray, a_scale: jnp.ndarray | None = None,
              block_m: int = 512, block_n: int = 512,
              out_dtype=None, allow_pad: bool = True,
              block_k: int | None = None) -> jnp.ndarray:
    """Grouped matmul over int4 interleaved-pairs expert weights.

    x [Sp, K] group-aligned rows (int8 with a_scale [Sp, 1] for W4A8, else
    float); packed [E, K/2, N] nibble-packed int8 (logical rows 2r / 2r+1
    in packed row r's lo/hi nibbles —
    utils/quantize._quantize_kernel4h); scale [E, 2, 1, N] per-half
    per-channel (groups=2); tile_gid [Sp // block_m]. Requires K/2 % 128 == 0
    (lane alignment). -> [Sp, N].

    Pairs packing means a packed K-block covers CONTIGUOUS logical rows,
    so x streams straight from [Sp, K] (the prior halves layout needed a
    pre-split [2, Sp, K/2] strided copy of every activation) and the
    in-kernel unpack is one hardware bitcast (`unpack_pairs`). K blocks
    are sized to divide K/4 so no block straddles the scale-group
    boundary; awkward K/2 without a good divisor (e.g. unpadded
    5504 = 43x128) degrades to small blocks — the flagship stacks are
    pre-padded (utils/quantize.pad_moe_experts_for_gmm) to shapes with
    large divisors (5632 -> bk 1408)."""
    sp, k = x.shape
    e, k2, n = packed.shape
    assert 2 * k2 == k and scale.shape == (e, 2, 1, n)
    assert k2 % 128 == 0, "int4h gmm needs K/2 lane-aligned (128)"
    bm = block_m
    bn = min(block_n, n)
    assert sp % bm == 0 and tile_gid.shape == (sp // bm,)
    int8_x = x.dtype == jnp.int8
    if out_dtype is None:
        out_dtype = jnp.bfloat16 if int8_x else x.dtype
    if a_scale is None:
        a_scale = jnp.ones((sp, 1), jnp.float32)

    # block_k raises the K-block cap (in packed rows): tiny-m decode tiles
    # are grid-step-latency-bound, not VMEM-bound — fewer, larger blocks
    # win (one gmm_int4h call at decode shapes measured 0.53 ms with the
    # default 88-step grid vs a 0.058 ms traffic roofline). Cap by
    # activation width: the kernel holds the [bm, 2bk] x block, the packed
    # + unpacked w blocks and two accumulators in VMEM.
    cap = block_k if block_k else max(512, 2048 // x.dtype.itemsize)
    k4 = k2 // 2                            # group boundary, packed rows
    if k2 <= cap:
        bk, single, kb_lo = k2, True, 1     # one block spans both groups
    else:
        # largest x-lane-aligned (2bk % 128 -> bk % 64) block dividing the
        # boundary: bk | k4 keeps every block inside one scale group
        bk = 0
        for mult in range(min(cap, k4) // 64, 0, -1):
            if k4 % (64 * mult) == 0:
                bk = 64 * mult
                break
        assert bk, (k2, k4)
        single, kb_lo = False, k4 // bk
    n_kb = k2 // bk

    if not allow_pad and n % bn:
        # no-pad operands (whole-stack): shrink to the largest dividing
        # N block instead of padding the multi-GB stack
        bn = _best_block(n, bn)
    n_pad = -n % bn
    if n_pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, n_pad)))
        scale = jnp.pad(scale, ((0, 0), (0, 0), (0, 0), (0, n_pad)))
    np_ = n + n_pad

    interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sp // bm, np_ // bn, n_kb),
        in_specs=[
            # x K-block kk = logical columns [2*kk*bk, 2*(kk+1)*bk) —
            # contiguous under the pairs packing, no pre-split operand
            pl.BlockSpec((bm, 2 * bk), lambda i, j, kk, gid: (i, kk)),
            pl.BlockSpec((1, bk, bn), lambda i, j, kk, gid: (gid[i], kk, j)),
            pl.BlockSpec((1, 2, 1, bn),
                         lambda i, j, kk, gid: (gid[i], 0, 0, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk, gid: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, gid: (i, j)),
        scratch_shapes=[
            pltpu.VMEM((bm, bn), jnp.int32 if int8_x else jnp.float32),
            pltpu.VMEM((bm, bn), jnp.int32 if int8_x else jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_int4h, n_kb=n_kb, kb_lo=kb_lo,
                          single=single, int8_x=int8_x, interpret=interpret),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sp, np_), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * sp * np_ * k,
            bytes_accessed=x.size * x.dtype.itemsize
            + (sp // bm) * k2 * np_ + sp * np_ * 2,
            transcendentals=0),
        interpret=interpret,
    )(tile_gid, x, packed, scale, a_scale)
    return out[:, :n]


def _best_block(k2: int, cap: int = 2048) -> int:
    """Largest lane-aligned block <= cap that divides k2."""
    for mult in range(min(cap, k2) // 128, 0, -1):
        if k2 % (128 * mult) == 0:
            return 128 * mult
    return k2


def quantize_rows(x: jnp.ndarray):
    """Per-row symmetric int8 activation quant for the W8A8 gmm path.
    [Sp, K] -> (int8 [Sp, K], f32 scales [Sp, 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True), 1e-12) / 127.0
    return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s


def align_groups(xs: jnp.ndarray, expert_idx: jnp.ndarray,
                 num_experts: int, block_m: int):
    """Scatter top-1-routed tokens into a group-ALIGNED buffer: group g
    occupies rows [aligned_offs[g], aligned_offs[g] + size_g) where every
    aligned_offs is a multiple of block_m (gap rows stay zero).

    SORT-FREE: stable within-group ranks come from a per-expert cumsum
    (two VPU passes over [S, E]) instead of a stable argsort + gather —
    jnp.argsort at S ~ 10k costs ~ms/layer on TPU and accounted for most
    of the composed MoE-vs-dense prefill gap (trace: 852 vs 660 ms for
    the 32-layer scan; bn/bk identical). Token i's destination row is
    aligned_offs[expert(i)] + rank(i), so the inverse mapping is the same
    `dest` vector: no unsort scatter on the way out either.

    xs [S, K]; expert_idx [S] int32. -> (x_aligned [Sp, K], dest [S] row
    ids, tile_gid [Sp // block_m]).

    E = 2 (the flagship): TWO-ENDED packing — group 0 grows from row 0,
    group 1 DESCENDS from row Sp-1, so ONE block_m of static gap absorbs
    both groups' tile alignment instead of the general layout's E
    round-ups (Sp = S + bm vs S + E*bm: at the flagship prefill that is
    +5% padded FFN rows instead of +10%, and every aligned m-tile still
    holds exactly one group because the gap is >= block_m wide — a tile
    cannot touch both groups). Row order within group 1 is reversed,
    which is invisible to the row-independent grouped matmul and to the
    `dest` gather."""
    s = xs.shape[0]
    onehot = jax.nn.one_hot(expert_idx, num_experts, dtype=jnp.int32)
    csum = jnp.cumsum(onehot, axis=0)                       # [S, E]
    ranks = jnp.take_along_axis(csum, expert_idx[:, None], 1)[:, 0] - 1
    group_sizes = csum[-1]                                  # [E]
    if num_experts == 2:
        sp = ((s + block_m - 1) // block_m + 1) * block_m   # gap >= bm
        dest = jnp.where(expert_idx == 0, ranks, sp - 1 - ranks)
        x_al = jnp.zeros((sp, xs.shape[1]), xs.dtype).at[dest].set(xs)
        # a tile belongs to group 1 iff it contains any group-1 row
        # (tile_end > sp - n1); it then contains no group-0 row since
        # n0 <= sp - n1 - bm <= tile_start
        tile_end = (jnp.arange(sp // block_m, dtype=jnp.int32) + 1) \
            * block_m
        tile_gid = (tile_end > sp - group_sizes[1]).astype(jnp.int32)
        return x_al, dest, tile_gid
    sp = (s // block_m + num_experts) * block_m  # static worst case
    aligned = ((group_sizes + block_m - 1) // block_m) * block_m
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(aligned.astype(jnp.int32))[:-1]])
    dest = offs[expert_idx] + ranks
    x_al = jnp.zeros((sp, xs.shape[1]), xs.dtype).at[dest].set(xs)
    # expert id per m-tile: number of groups fully BEFORE the tile start
    ends = jnp.cumsum(aligned.astype(jnp.int32))
    tile_start = jnp.arange(sp // block_m, dtype=jnp.int32) * block_m
    tile_gid = jnp.sum(tile_start[:, None] >= ends[None, :],
                       axis=1).astype(jnp.int32)
    tile_gid = jnp.minimum(tile_gid, num_experts - 1)  # tail tiles: no-ops
    return x_al, dest, tile_gid
