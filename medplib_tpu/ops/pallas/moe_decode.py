"""Fused decode-step MoE FFN: routing + SwiGLU + combine in ONE kernel.

At decode shapes (m = batch rows, 8-32) the grouped-matmul formulation
pays three pallas dispatches per layer (gate/up/down), three HBM
round-trips for the [Sp, M] intermediates, and a grid whose per-step
latency is dominated by weight-block DMA + MXU load rather than math —
measured ~3x the weight-traffic roofline per call
(benchmarks/profile_decode.py; ~23.4 ms/step for the int4h flagship vs a
~19.6 dense int8 floor).

This kernel computes the ENTIRE routed expert FFN for a decode step in
one pallas_call per layer, reading every weight byte exactly once:

  grid (E, M/2/bn, 2): step (e, j, nh) covers expert e's N-half nh,
  column block j:
    g = (x_lo @ Wg_lo + x_hi @ Wg_hi) * per-K-half scales
    u = likewise
    act = silu(g) * u * route_mask[:, e]      <- routing folded in here
    acc += act @ Wd[nibble nh] * down-scale[nh]
  The [B, M] activation never exists — only a [B, bn] tile in VMEM — and
  the routed combine is the row mask (token rows routed to expert e
  contribute only during e's grid steps), so the [B, H] accumulator IS
  the MoE output when the grid finishes.

Weight layout is the stored int4 interleaved-pairs stack
(utils/quantize._quantize_kernel4h): packed [G, K/2, N] with logical
rows 2r / 2r+1 in packed row r's lo/hi nibbles, per-half scales
[G, 2, 1, N]. The pairs order is exactly what the hardware narrowing
bitcast emits, so each weight block unpacks to natural logical order in
ONE op (ops/pallas/gmm.unpack_pairs) — the prior halves layout needed
two i32 shift chains per nibble plane, and those chains were the ENTIRE
residual decode gap vs the dense int8 floor (21.10 ms/step vs the 19.72
no-unpack diagnostic floor; bitcast cost profile 19.83 —
benchmarks/profile_decode.py, round 5). The N-half grid axis maps column
block (nh, j) of gate/up to down PACKED row block nh*n_j + j (bn logical
= bn/2 packed rows, all in scale group nh). Blocks carry NO size-2 axes:
a [K/2, 2, bn] block sublane-pads 2 -> 8 and quadruples its VMEM
footprint (measured 20-29 MB scoped OOM); indexing the flat [K/2, M]
column axis with nh*n_j + j avoids any relayout.

Single-shard path (the 1-chip flagship decode); the expert-parallel
dispatch keeps the 3-call gmm inside its shard_map (ops/moe._gmm_moe_ep).
EP decode cost bound: the 3-call gmm measured 23.4 ms/step on one chip
streaming ALL experts vs 19.67 fused (post pairs-migration), and under
ep-way sharding each chip streams only E/ep experts — expert DMA (the
dominant decode term) scales 1/ep while the per-layer
all_gather/psum_scatter of [rows, H] rides ICI at negligible size
(~100 KB at B=12), so EP decode projects BELOW the single-chip fused
number; the +19% fused-vs-3-call delta bounds what a fused shard-local
kernel would additionally recover (README "EP decode cost note").
Reference scope: deepspeed MoE inference dispatch,
medplib_moe_llama.py:602-614.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu




def _kernel(gid_ref, x_ref, xs_ref, mask_ref, gp_ref, gs_ref, up_ref,
            us_ref, dp_ref, ds_ref, o_ref, acc_ref, *, n_e: int, n_j: int,
            int8_x: bool, interpret: bool):
    from medplib_tpu.ops.pallas.gmm import unpack_pairs
    e, j, nh = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((e == 0) & (j == 0) & (nh == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bf = jnp.bfloat16
    x_lo, x_hi = x_ref[0], x_ref[1]           # [B, K/2] bf16 or s8

    def gu(p_ref, s_ref):
        w = unpack_pairs(p_ref[0], interpret)  # [K, bn] natural rows
        k2 = p_ref.shape[1]
        wl, wh = w[:k2], w[k2:]               # scale-group halves
        if int8_x:
            # s8 x s8 -> s32 on the int8 MXU: no i8->bf16 convert of the
            # weight block (the VPU cost that kept the bf16 variant at
            # the 3-call gmm's speed); x's per-row scale is folded in
            # with the per-K-half channel scales at f32
            a = jax.lax.dot(x_lo, wl, preferred_element_type=jnp.int32)
            b = jax.lax.dot(x_hi, wh, preferred_element_type=jnp.int32)
            s = s_ref[0].astype(jnp.float32)
            xr = xs_ref[...].astype(jnp.float32)   # [B, 1] row scales
            return (a.astype(jnp.float32) * s[0:1]
                    + b.astype(jnp.float32) * s[1:2]) * xr
        a = jax.lax.dot(x_lo, wl.astype(bf),
                        preferred_element_type=jnp.float32)
        b = jax.lax.dot(x_hi, wh.astype(bf),
                        preferred_element_type=jnp.float32)
        s = s_ref[0].astype(jnp.float32)      # [2, bn] per-K-half scales
        return a * s[0:1] + b * s[1:2]        # [B, bn] f32

    g = gu(gp_ref, gs_ref)
    u = gu(up_ref, us_ref)
    act = jax.nn.silu(g) * u
    # routing folded in: rows not routed to expert e contribute zero.
    # mask rides as a full [B, E] block (TPU block rule: last dims must be
    # 8/128-aligned OR whole-array); column e selected by iota compare
    # (Mosaic has no dynamic_slice lowering)
    m = mask_ref[...]
    cols = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    mask_e = jnp.sum(jnp.where(cols == e, m, 0.0), axis=1, keepdims=True)
    act = act * mask_e

    # down: the bn logical rows needed at (nh, j) — gate/up column block
    # nh*n_j + j — are CONTIGUOUS under the pairs packing (packed row
    # block nh*n_j + j, bn/2 rows), so the block unpacks straight to the
    # needed [bn, H] slab; no plane-select shifts
    w_sel = unpack_pairs(dp_ref[0], interpret)
    ds = ds_ref[0].astype(jnp.float32)        # [2, H]
    ds_sel = jnp.where(nh == 0, ds[0:1], ds[1:2])
    if int8_x:
        # per-row-per-block act quantization: exact because each block's
        # s32 product is rescaled by ITS scale before accumulation
        amax = jnp.max(jnp.abs(act), axis=1, keepdims=True)
        a_sc = jnp.maximum(amax, 1e-12) / 127.0
        act_q = jnp.clip(jnp.round(act / a_sc), -127, 127).astype(jnp.int8)
        d = jax.lax.dot(act_q, w_sel, preferred_element_type=jnp.int32)
        acc_ref[...] += d.astype(jnp.float32) * a_sc * ds_sel
    else:
        acc_ref[...] += jax.lax.dot(
            act.astype(bf), w_sel.astype(bf),
            preferred_element_type=jnp.float32) * ds_sel

    @pl.when((e == n_e - 1) & (j == n_j - 1) & (nh == 1))
    def _fin():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _pick_bn(m2: int, cap: int = 512) -> int:
    """Largest lane-aligned block <= cap dividing M/2 (0 if none). cap 512:
    gate+up [K/2, bn] + down [bn, H] double-buffered stay well inside the
    16 MB scoped-vmem budget at flagship K/2=2048, H=4096."""
    for mult in range(min(cap, m2) // 128, 0, -1):
        if m2 % (128 * mult) == 0:
            return 128 * mult
    return 0


def fused_decode_eligible(experts, num_experts: int) -> bool:
    """The fused kernel streams stored stacks with ZERO relayout copies;
    check the int4h(G=2) shapes allow it. experts: stacked whole-layer
    nodes with kernels [G_all, K/2, N]."""
    try:
        gp = experts["gate_proj"]
        up = experts["up_proj"]
        dp = experts["down_proj"]
        for n in (gp, up, dp):
            if "scale4h" not in n or n["scale4h"].shape[-3] != 2:
                return False
            if n["kernel"].dtype != jnp.int8 or n["kernel"].ndim != 3:
                return False
        k2g, m = gp["kernel"].shape[-2], gp["kernel"].shape[-1]
        if up["kernel"].shape[-2:] != (k2g, m):
            return False
        m2, h = dp["kernel"].shape[-2], dp["kernel"].shape[-1]
        if m != 2 * m2 or h != 2 * k2g:
            return False
        if _pick_bn(m2) == 0 or k2g % 8 != 0 or h % 128 != 0:
            return False
        return True
    except (KeyError, AttributeError, TypeError):
        return False


def moe_ffn_decode_int4h(x: jnp.ndarray, experts, route_idx: jnp.ndarray,
                         route_gate: jnp.ndarray, gid_offset,
                         num_experts: int,
                         block_n: int | None = None,
                         int8_x: bool = False) -> jnp.ndarray:
    """x [B, H] (bf16/f32); experts: whole-stack int4h(G=2) nodes
    (kernels [L*E, K/2, N], scale4h [L*E, 2, 1, N]); route_idx [B] int32
    top-1 expert per row; route_gate [B] f32 combine weight; gid_offset
    traced scalar = layer * E. -> routed MoE output [B, H], x.dtype.

    int8_x: W4A8 — x quantized per row outside, the activation tile per
    row-per-block inside; all dots run on the s8 MXU with f32 rescale at
    accumulation (exact per-block rescaling, no extra approximation
    beyond the A8 rounding itself)."""
    b, h = x.shape
    e = num_experts
    h2 = h // 2
    gp, up, dp = (experts[n] for n in ("gate_proj", "up_proj", "down_proj"))
    m = gp["kernel"].shape[-1]
    m2 = m // 2
    bn = block_n or _pick_bn(m2)
    assert bn and m2 % bn == 0, (m2, bn)
    n_j = m2 // bn

    # pad rows to the bf16 sublane tile so tiny decode batches lower
    bp = -b % 16
    if int8_x:
        from medplib_tpu.ops.pallas.gmm import quantize_rows
        xb, xs = quantize_rows(x)
    else:
        xb = x.astype(jnp.bfloat16)
        xs = jnp.ones((b, 1), jnp.float32)
    if bp:
        xb = jnp.pad(xb, ((0, bp), (0, 0)))
        xs = jnp.pad(xs, ((0, bp), (0, 0)))
    bt = b + bp
    x2 = jnp.stack([xb[:, :h2], xb[:, h2:]])            # [2, B, H/2]

    # [B, E] routed-gate mask: column e is the combine weight for rows
    # routed to e, zero elsewhere
    mask = (jax.nn.one_hot(route_idx, e, dtype=jnp.float32)
            * route_gate[:, None].astype(jnp.float32))
    if bp:
        mask = jnp.pad(mask, ((0, bp), (0, 0)))

    # free views: only the scales drop their broadcast axis
    gsv = gp["scale4h"].reshape(-1, 2, m)                # [G, 2, M]
    usv = up["scale4h"].reshape(-1, 2, m)
    dsv = dp["scale4h"].reshape(-1, 2, h)                # [G, 2, H]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(e, n_j, 2),
        in_specs=[
            pl.BlockSpec((2, bt, h2), lambda ee, j, nh, gid: (0, 0, 0)),
            pl.BlockSpec((bt, 1), lambda ee, j, nh, gid: (0, 0)),
            pl.BlockSpec((bt, e), lambda ee, j, nh, gid: (0, 0)),
            # gate/up: column block j of N-half nh is flat column block
            # nh*n_j + j of the stored [K/2, M] layout — no view needed
            pl.BlockSpec((1, h2, bn),
                         lambda ee, j, nh, gid: (gid[0] + ee, 0,
                                                 nh * n_j + j)),
            pl.BlockSpec((1, 2, bn),
                         lambda ee, j, nh, gid: (gid[0] + ee, 0,
                                                 nh * n_j + j)),
            pl.BlockSpec((1, h2, bn),
                         lambda ee, j, nh, gid: (gid[0] + ee, 0,
                                                 nh * n_j + j)),
            pl.BlockSpec((1, 2, bn),
                         lambda ee, j, nh, gid: (gid[0] + ee, 0,
                                                 nh * n_j + j)),
            # down: the bn logical rows for (nh, j) are packed row block
            # nh*n_j + j (bn/2 packed rows — pairs layout); same total
            # bytes as the prior shared full-block DMA, fetched per step
            pl.BlockSpec((1, bn // 2, h),
                         lambda ee, j, nh, gid: (gid[0] + ee,
                                                 nh * n_j + j, 0)),
            pl.BlockSpec((1, 2, h), lambda ee, j, nh, gid: (gid[0] + ee,
                                                            0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, h), lambda ee, j, nh, gid: (0, 0)),
        scratch_shapes=[pltpu.VMEM((bt, h), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, n_e=e, n_j=n_j, int8_x=int8_x,
                          interpret=jax.default_backend() != "tpu"),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bt, h), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * e * bt * h * 3 * m,
            bytes_accessed=e * (2 * h2 * m + m2 * h) + bt * h * 6,
            transcendentals=e * bt * m),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(gid_offset, jnp.int32).reshape(1),
      x2, xs, mask, gp["kernel"], gsv, up["kernel"], usv, dp["kernel"], dsv)
    return out[:b]
