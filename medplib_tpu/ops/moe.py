"""Mixture-of-Experts: top-k router + capacity-based dispatch/combine.

TPU-native replacement for `deepspeed.moe.layer.MoE`
(/root/reference/model/medplib/model/language_model/medplib_moe_llama.py:
602-614; SURVEY.md §2.4). Gating reproduces DeepSpeed's top1/top2 semantics
(softmax gates, capacity = ceil(tokens/experts * capacity_factor) clamped to
min_capacity, position-in-expert by cumsum, overflow tokens dropped, aux loss
= num_experts * Σ_e mean_prob_e * mean_assignment_e) so the released
MedPLIB-7b-2e checkpoint routes identically (top-1, capacity 1.5,
train_stage4.sh:104-110).

Dispatch/combine are einsums over one-hot [tokens, experts, capacity]
masks — the GShard formulation. On a sharded mesh the expert dim of
`expert_inputs` is annotated with the `expert` axis, and XLA lowers the
resharding to the same all-to-all DeepSpeed issues via NCCL, but over ICI.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from medplib_tpu.config import MoeConfig


class GateOutput(NamedTuple):
    combine: jnp.ndarray   # [S, E, C] f32 combine weights
    dispatch: jnp.ndarray  # [S, E, C] bool one-hot dispatch mask
    aux_loss: jnp.ndarray  # scalar load-balancing loss
    expert_counts: jnp.ndarray  # [E] tokens routed per expert (pre-drop)


def capacity_for(num_tokens: int, num_experts: int, capacity_factor: float,
                 min_capacity: int) -> int:
    cap = math.ceil(num_tokens / num_experts * capacity_factor)
    return max(cap, min_capacity)


def _one_hot(x, n):
    return jax.nn.one_hot(x, n, dtype=jnp.int32)


def top1_gate(logits: jnp.ndarray, capacity: int) -> GateOutput:
    """DeepSpeed top1gating (no noise policy, drop_tokens=True)."""
    s, e = logits.shape
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    idx = jnp.argmax(gates, axis=-1)
    mask1 = _one_hot(idx, e)  # [S, E]

    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(mask1.astype(jnp.float32), axis=0)
    aux = jnp.sum(me * ce) * e

    locations = jnp.cumsum(mask1, axis=0) - mask1  # position within expert
    loc_s = jnp.sum(locations * mask1, axis=-1)    # [S]
    keep = loc_s < capacity
    mask1 = mask1 * keep[:, None].astype(jnp.int32)

    gate_s = jnp.sum(gates * mask1, axis=-1)  # raw prob for kept tokens
    combine = (gate_s[:, None, None] * mask1[:, :, None].astype(jnp.float32) *
               _one_hot(jnp.clip(loc_s, 0, capacity - 1), capacity
                        )[:, None, :].astype(jnp.float32))
    dispatch = combine > 0.0
    return GateOutput(combine, dispatch, aux,
                      jnp.sum(_one_hot(idx, e), axis=0))


def top2_gate(logits: jnp.ndarray, capacity: int) -> GateOutput:
    """DeepSpeed top2gating: second expert from masked argmax, gate values
    normalized by their sum, aux loss from the top-1 assignment only."""
    s, e = logits.shape
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    idx1 = jnp.argmax(gates, axis=-1)
    mask1 = _one_hot(idx1, e)
    logits2 = jnp.where(mask1.astype(bool), -jnp.inf, gates)
    idx2 = jnp.argmax(logits2, axis=-1)
    mask2 = _one_hot(idx2, e)

    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(mask1.astype(jnp.float32), axis=0)
    aux = jnp.sum(me * ce) * e

    loc1 = jnp.cumsum(mask1, axis=0) - mask1
    loc2 = jnp.cumsum(mask2, axis=0) - mask2 + jnp.sum(mask1, axis=0,
                                                       keepdims=True)
    loc1_s = jnp.sum(loc1 * mask1, axis=-1)
    loc2_s = jnp.sum(loc2 * mask2, axis=-1)
    mask1 = mask1 * (loc1_s < capacity)[:, None].astype(jnp.int32)
    mask2 = mask2 * (loc2_s < capacity)[:, None].astype(jnp.int32)

    g1 = jnp.sum(gates * mask1, axis=-1)
    g2 = jnp.sum(gates * mask2, axis=-1)
    denom = jnp.clip(g1 + g2, 1e-9, None)
    g1, g2 = g1 / denom, g2 / denom

    def comb(g, mask, loc):
        return (g[:, None, None] * mask[:, :, None].astype(jnp.float32) *
                _one_hot(jnp.clip(loc, 0, capacity - 1), capacity
                         )[:, None, :].astype(jnp.float32))

    combine = comb(g1, mask1, loc1_s) + comb(g2, mask2, loc2_s)
    dispatch = combine > 0.0
    return GateOutput(combine, dispatch, aux,
                      jnp.sum(_one_hot(idx1, e) + _one_hot(idx2, e), axis=0))


def gate(logits: jnp.ndarray, k: int, capacity: int) -> GateOutput:
    if k == 1:
        return top1_gate(logits, capacity)
    if k == 2:
        return top2_gate(logits, capacity)
    raise NotImplementedError(f"top-{k} gating")


class SortDispatch(NamedTuple):
    """Sorted token routing: which token fills each [E, C] expert slot."""

    slot_token: jnp.ndarray   # [E*C] source token (or S for empty slots)
    token_slot: jnp.ndarray   # [S*k] destination slot (E*C for dropped)
    token_prob: jnp.ndarray   # [S*k] combine weight (0 for dropped)
    token_src: jnp.ndarray    # [S*k] original token id of the entry
    aux_loss: jnp.ndarray


def sort_dispatch(logits: jnp.ndarray, k: int, capacity: int) -> SortDispatch:
    """DeepSpeed-equivalent routing via a stable sort instead of one-hot
    matmuls: the einsum dispatch is O(S * E * C * H) — quadratic in tokens —
    while this is O(S log S + S * H) gathers. Slot assignment reproduces the
    cumsum position semantics exactly: entries are laid out
    [all 1st choices in token order, then all 2nd choices] so a stable sort
    by expert yields deepspeed's per-expert ordering (top-2 second choices
    after first choices, medplib's top1gating/top2gating)."""
    s, e = logits.shape
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    experts, probs = [], []
    masked = gates
    for _ in range(k):
        idx = jnp.argmax(masked, axis=-1)
        experts.append(idx)
        probs.append(jnp.take_along_axis(gates, idx[:, None], axis=1)[:, 0])
        masked = jnp.where(jax.nn.one_hot(idx, e, dtype=bool), -jnp.inf,
                           masked)
    flat_expert = jnp.concatenate(experts)  # [S*k], choice-major
    flat_prob = jnp.concatenate(probs)
    flat_token = jnp.tile(jnp.arange(s), k)

    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(jax.nn.one_hot(experts[0], e), axis=0)
    aux = jnp.sum(me * ce) * e

    order = jnp.argsort(flat_expert, stable=True)          # [S*k]
    sorted_expert = flat_expert[order]
    group_start = jnp.searchsorted(sorted_expert, sorted_expert, side="left")
    rank = jnp.arange(s * k) - group_start                  # rank in expert
    keep = rank < capacity
    slot_of_sorted = jnp.where(keep, sorted_expert * capacity + rank,
                               e * capacity)

    token_slot = jnp.full((s * k,), e * capacity, jnp.int32)
    token_slot = token_slot.at[order].set(slot_of_sorted.astype(jnp.int32))
    token_prob = jnp.where(token_slot < e * capacity, flat_prob, 0.0)
    if k == 2:
        # top2gating normalizes AFTER capacity dropping: a dropped first
        # choice shifts full weight onto the surviving second choice
        p1, p2 = token_prob[:s], token_prob[s:]
        denom = jnp.clip(p1 + p2, 1e-9, None)
        token_prob = jnp.concatenate([p1 / denom, p2 / denom])
        token_prob = jnp.where(token_slot < e * capacity, token_prob, 0.0)

    slot_token = jnp.full((e * capacity + 1,), s, jnp.int32)
    slot_token = slot_token.at[slot_of_sorted].set(
        flat_token[order].astype(jnp.int32), mode="drop")
    return SortDispatch(slot_token=slot_token[:-1], token_slot=token_slot,
                        token_prob=token_prob, token_src=flat_token,
                        aux_loss=aux)


def _ragged_moe(xs: jnp.ndarray, logits: jnp.ndarray, experts,
                dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-padding top-1 expert MLP via jax.lax.ragged_dot (grouped
    matmul): tokens are stably sorted by chosen expert, each expert
    contracts ONLY its actual tokens, outputs scatter back by the inverse
    permutation.

    Exact-equivalent to the capacity dispatch whenever capacity >= S (no
    token can be dropped) — which holds for the shipped config at eval
    (top-1, 2 experts, eval_capacity_factor 2.0 -> capacity == S). The
    capacity formulation pads every expert to `capacity` slots, so at
    eval cf 2.0 it computes 2x the FFN FLOPs, half on padding; this
    computes exactly S token-slots — the MoE prefill at dense-model cost.
    """
    s, h = xs.shape
    e = logits.shape[-1]
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    idx = jnp.argmax(gates, axis=-1)
    gate_s = jnp.take_along_axis(gates, idx[:, None], axis=1)[:, 0]

    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(jax.nn.one_hot(idx, e), axis=0)
    aux = jnp.sum(me * ce) * e

    order = jnp.argsort(idx, stable=True)
    group_sizes = jnp.bincount(idx, length=e).astype(jnp.int32)
    xs_sorted = xs[order]

    from medplib_tpu.train.lora import dequant_kernel

    def rag(node, xin):
        # int4h/int8 experts dequantize per-layer-slice here (ragged_dot's
        # rhs is a dense [E, K, N] operand); the transient bf16 copy is one
        # layer's experts, and the FLOP savings dwarf its traffic
        return jax.lax.ragged_dot(xin, dequant_kernel(node, xin.dtype),
                                  group_sizes)

    h1 = rag(experts["gate_proj"], xs_sorted)
    h2 = rag(experts["up_proj"], xs_sorted)
    out = rag(experts["down_proj"], jax.nn.silu(h1) * h2)
    y_sorted = out * gate_s[order][:, None].astype(out.dtype)
    y = jnp.zeros((s, h), dtype).at[order].set(y_sorted.astype(dtype))
    return y, aux


def _gmm_moe(xs: jnp.ndarray, logits: jnp.ndarray, experts,
             dtype, block_m: int = 512,
             gid_offset=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-1 expert MLP via the Pallas grouped matmul (ops/pallas/gmm):
    expert-sorted tokens in a group-ALIGNED buffer, each m-tile dotted
    against exactly its expert's weights — ~S token-slots of FFN compute
    instead of the capacity dispatch's E*capacity (2S at eval cf 2.0).
    Exact-equivalent whenever capacity >= S (zero-drop; see _ragged_moe).
    jax.lax.ragged_dot measured 22 TF/s on v5e-axon — this kernel exists
    because the stock lowering loses to even the padded path.

    gid_offset (traced scalar or None): whole-stack layer indexing. The
    expert nodes then hold ALL layers' weights ([L*E, K, N] kernels) and
    the m-tile group ids address expert gid_offset + local. Inside the
    layer scan this keeps the weight operand the SAME loop-invariant
    buffer every iteration — the per-layer dynamic-slice that XLA must
    otherwise materialize for a pallas_call operand (hundreds of MB/layer
    of HBM copies, README round-2 perf notes) never happens."""
    from medplib_tpu.ops.pallas.gmm import align_groups, gmm
    from medplib_tpu.train.lora import dequant_kernel

    s, h = xs.shape
    e = logits.shape[-1]
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    idx = jnp.argmax(gates, axis=-1)
    gate_s = jnp.take_along_axis(gates, idx[:, None], axis=1)[:, 0]

    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(jax.nn.one_hot(idx, e), axis=0)
    aux = jnp.sum(me * ce) * e

    stacked = gid_offset is not None
    if stacked and block_m <= 64:
        # decode tiles: the single fused routing+SwiGLU+combine kernel
        # (one pallas dispatch and one read of every weight block per
        # layer) replaces 3 grouped matmuls + their [Sp, M] HBM
        # intermediates. MEDPLIB_DECODE_FUSED=0 falls back for A/Bs.
        import os
        from medplib_tpu.ops.pallas.moe_decode import (
            fused_decode_eligible, moe_ffn_decode_int4h)
        if os.environ.get("MEDPLIB_DECODE_FUSED", "1") == "1" and \
                fused_decode_eligible(experts, e):
            # A8 (s8xs8 MXU) decode defaults ON: measured 21.12 vs 23.21
            # ms/step bf16-x at the 32L flagship, and fidelity-identical
            # to the bf16-x int4h path on the quant_fidelity budget
            # (top-1 0.5195 vs 0.5156 vs the bf16 reference, same SEG
            # cosine 0.9734 — the A8 rounding is invisible next to the
            # int4 weight error). MEDPLIB_DECODE_A8=0 forces bf16 x.
            y = moe_ffn_decode_int4h(
                xs, experts, idx.astype(jnp.int32), gate_s, gid_offset, e,
                int8_x=os.environ.get("MEDPLIB_DECODE_A8", "1") == "1")
            return y.astype(dtype), aux

    x_al, dest, tile_gid = align_groups(xs, idx.astype(jnp.int32), e,
                                        block_m)
    if stacked:
        tile_gid = tile_gid + jnp.asarray(gid_offset, jnp.int32)
    out_al = _gmm_ffn(x_al, tile_gid, experts, dtype, block_m, stacked)
    # dest maps token i -> its aligned row, so the combine is a single
    # gather — no unsort scatter (align_groups docstring)
    y = (out_al[dest] * gate_s[:, None].astype(out_al.dtype)).astype(dtype)
    return y, aux


def _gmm_ffn(x_al: jnp.ndarray, tile_gid: jnp.ndarray, experts, dtype,
             block_m: int, stacked: bool) -> jnp.ndarray:
    """SwiGLU expert FFN over a group-aligned buffer: three grouped
    matmuls (gate/up/down) steered by tile_gid. Shared by the single-shard
    gmm dispatch (_gmm_moe) and the expert-parallel one (_gmm_moe_ep).
    -> out_al [Sp, H]."""
    from medplib_tpu.ops.pallas.gmm import gmm, gmm_int4h
    from medplib_tpu.train.lora import dequant_kernel

    def wspec(node):
        # int8 nodes pass through natively (in-kernel epilogue dequant);
        # int4h with per-half scales (groups=2, the flagship layout from
        # quantize_flagship_moe) streams packed nibbles through gmm_int4h
        # (0.5 byte/weight, in-register unpack); finer-grained int4h
        # dequantizes to a one-layer bf16 copy outside
        k = node["kernel"]
        if "scale" in node and k.dtype == jnp.int8:
            return "int8", k, node["scale"].astype(jnp.float32)
        if ("scale4h" in node and node["scale4h"].shape[-3] == 2
                and k.shape[-2] % 128 == 0):
            return "int4h", k, node["scale4h"].astype(jnp.float32)
        assert not stacked, "whole-stack gmm requires int8/int4h(G=2) experts"
        return "dense", dequant_kernel(node, dtype), None

    specs = {n: wspec(experts[n])
             for n in ("gate_proj", "up_proj", "down_proj")}

    # tiny-m (decode) tiles: larger N/K blocks — the grid-step latency of
    # an 88-step decode grid costs ~9x the weight-traffic roofline per
    # call (ops/pallas/gmm.py gmm_int4h block_k note)
    if block_m <= 64:
        big = {"block_n": 1024, "block_k": 2048}
    else:
        # prefill N-block A/B (trace-time): the x block is re-DMA'd once
        # per N block, so bn sets activation traffic (~3 GB/layer of the
        # flagship prefill at bn=512) — benchmarks/profile_prefill.py
        import os
        bn_env = os.environ.get("MEDPLIB_PREFILL_GMM_BN")
        big = {"block_n": int(bn_env)} if bn_env else {}

    def mm(xin, spec):
        kind, w, sc = spec
        pad_ok = not stacked   # padding a whole-stack operand would copy it
        if kind == "dense":
            return gmm(xin[0], w, tile_gid, block_m=block_m)
        xq, xsc = xin[1]
        if xq is not None:
            # fused W8A8/W4A8: s8 x s8 dots with int32 VMEM accumulation
            # and the (row x channel) rescale at the kernel epilogue — the
            # int32 product never touches HBM (the structural loss that
            # capped the XLA W8A8 composition at ~1.08x, README perf notes)
            if kind == "int4h":
                return gmm_int4h(xq, w, sc, tile_gid, a_scale=xsc,
                                 block_m=block_m, allow_pad=pad_ok, **big)
            return gmm(xq, w, tile_gid, sc, a_scale=xsc, block_m=block_m,
                       allow_pad=pad_ok)
        if kind == "int4h":
            return gmm_int4h(xin[0], w, sc, tile_gid, block_m=block_m,
                             allow_pad=pad_ok, **big)
        return gmm(xin[0], w, tile_gid, sc, block_m=block_m,
                   allow_pad=pad_ok)

    from medplib_tpu.utils.quantize import act_quant_enabled
    actq = act_quant_enabled() and all(
        s[0] != "dense" for s in specs.values())

    def xpair(xv):
        if actq:
            from medplib_tpu.ops.pallas.gmm import quantize_rows
            return xv, quantize_rows(xv)
        return xv, (None, None)

    xin = xpair(x_al)
    h1 = mm(xin, specs["gate_proj"])
    h2 = mm(xin, specs["up_proj"])
    return mm(xpair(jax.nn.silu(h1) * h2), specs["down_proj"])


def _gmm_moe_ep(xs: jnp.ndarray, logits: jnp.ndarray, experts_le, dtype,
                num_experts: int, ep: int, gid_offset,
                block_m: int = 512) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EXPERT-PARALLEL whole-stack grouped-matmul dispatch (top-1).

    The expert stacks stay sharded on the `expert` mesh axis (kernels
    [L, E, K, N] with spec P(None, 'expert', ...)); a full-manual
    jax.shard_map runs the gmm per expert shard:

      all_gather tokens over `expert` -> each shard routes the gathered
      tokens to ITS local experts (remote tokens land in a zero-gated
      dummy group), local [L, E/ep, K, N] stacks reshape to the shard's
      own whole-stack [L*E/ep, K, N] view (free: dims 0,1 are contiguous),
      one _gmm_ffn steered by local tile ids + the layer offset, then
      psum_scatter over `expert` returns each token's single nonzero
      contribution to its home shard.

    This is DeepSpeed's `ep_size` inference partitioning
    (medplib_moe_llama.py:602-614) expressed as gather/reduce-scatter ICI
    collectives instead of NCCL all-to-all. Cost note (why not all-to-all):
    with static shapes a drop-free all-to-all must provision worst-case
    capacity C = S_group per shard — identical buffer and FLOP budget to
    this formulation, with two extra reshuffles. Per-shard compute covers
    all gathered rows (the zero-gated remote tokens still occupy buffer
    tiles), so EP saves HBM weight traffic (each chip streams only E/ep
    experts — the serving-relevant bound at decode) but not FLOPs; for the
    2-expert flagship that is the information-theoretic floor of drop-free
    static dispatch. The MoE FFN is replicated over the `model` axis
    (DeepSpeed MoE does not tensor-parallelize experts either).

    Requires S % (data * expert) == 0 (checked by the caller's
    eligibility gate). aux loss comes from the global logits, outside the
    manual region.
    """
    from jax.sharding import PartitionSpec as P, get_abstract_mesh
    from medplib_tpu.ops.pallas.gmm import align_groups
    from medplib_tpu.parallel.mesh import AXIS_DATA, AXIS_EXPERT

    s, h = xs.shape
    e = num_experts
    e_loc = e // ep
    gates = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    idx = jnp.argmax(gates, axis=-1).astype(jnp.int32)
    gate_s = jnp.take_along_axis(gates, idx[:, None], axis=1)[:, 0]

    me = jnp.mean(gates, axis=0)
    ce = jnp.mean(jax.nn.one_hot(idx, e), axis=0)
    aux = jnp.sum(me * ce) * e

    def body(goff, xl, idxl, gatel, wl):
        ep_idx = jax.lax.axis_index(AXIS_EXPERT)
        xg = jax.lax.all_gather(xl, AXIS_EXPERT, tiled=True)
        idxg = jax.lax.all_gather(idxl, AXIS_EXPERT, tiled=True)
        gateg = jax.lax.all_gather(gatel, AXIS_EXPERT, tiled=True)
        sel = (idxg // e_loc) == ep_idx
        # remote tokens -> dummy group e_loc (sorts after the real local
        # groups); their rows compute against expert e_loc-1's weights but
        # the zeroed gate drops the result before the psum
        lidx = jnp.where(sel, idxg - ep_idx * e_loc, e_loc)
        gm = jnp.where(sel, gateg, 0.0)
        x_al, dest, tile_gid = align_groups(xg, lidx, e_loc + 1, block_m)
        tile_gid = jnp.minimum(tile_gid, e_loc - 1) + goff
        wloc = {n: {k: v.reshape((-1,) + v.shape[2:])
                    for k, v in node.items()}
                for n, node in wl.items()}
        out_al = _gmm_ffn(x_al, tile_gid, wloc, dtype, block_m, stacked=True)
        yg = (out_al[dest] * gm[:, None].astype(out_al.dtype)).astype(dtype)
        return jax.lax.psum_scatter(yg, AXIS_EXPERT, scatter_dimension=0,
                                    tiled=True)

    rows = P((AXIS_DATA, AXIS_EXPERT))
    w_specs = jax.tree_util.tree_map(
        lambda v: P(*((None, AXIS_EXPERT) + (None,) * (v.ndim - 2))),
        experts_le)
    y = jax.shard_map(
        body, mesh=get_abstract_mesh(),
        in_specs=(P(), P(*rows, None), rows, rows, w_specs),
        out_specs=P(*rows, None), check_vma=False,
    )(jnp.asarray(gid_offset, jnp.int32), xs, idx, gate_s, experts_le)
    return y, aux


def moe_mlp(
    moe_params,
    x: jnp.ndarray,
    cfg: MoeConfig,
    train: bool = True,
    ep_shard: bool = False,
    dispatch_mode: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expert-parallel SwiGLU MoE MLP.

    moe_params: {"router": {"kernel": [H, E]},
                 "experts": {gate_proj|up_proj: {"kernel": [E, H, M]},
                             down_proj: {"kernel": [E, M, H]}}}
    x: [B, T, H] -> ([B, T, H], aux_loss scalar).

    dispatch_mode: "sort" (capacity semantics via stable sort), "einsum"
    (GShard one-hot), "ragged" (jax.lax.ragged_dot), "gmm" (Pallas grouped
    matmul), or "auto" — gmm for prefill-sized batches when it is EXACTLY
    equivalent to the capacity dispatch (inference, top-1, capacity >= S
    so no token can be dropped, single shard), else sort.
    """
    b, t, h = x.shape
    s = b * t
    xs = x.reshape(s, h)
    e = moe_params["router"]["kernel"].shape[-1]
    cf = cfg.capacity_factor if train else cfg.eval_capacity_factor
    capacity = capacity_for(s, e, cf, cfg.min_capacity)

    logits = xs.astype(jnp.float32) @ moe_params["router"]["kernel"].astype(
        jnp.float32)

    if dispatch_mode == "auto":
        zero_drop = (not train) and cfg.top_k == 1 and capacity >= s \
            and not ep_shard
        # decode-sized S: routing overhead is trivial and every expert's
        # weights are read regardless — the sort path stays optimal there
        dispatch_mode = "gmm" if zero_drop and s >= 1024 else "sort"

    if dispatch_mode == "gmm":
        ep = moe_params.get("ep_size", 1)
        if ep > 1:
            y, aux = _gmm_moe_ep(
                xs, logits, moe_params["experts"], x.dtype,
                num_experts=e, ep=ep,
                gid_offset=moe_params.get("gid_offset", 0),
                block_m=moe_params.get("gmm_block_m", 512))
        else:
            y, aux = _gmm_moe(xs, logits, moe_params["experts"], x.dtype,
                              block_m=moe_params.get("gmm_block_m", 512),
                              gid_offset=moe_params.get("gid_offset"))
        if "residual_mlp" in moe_params:
            y = _apply_residual(moe_params, xs, y, x.dtype)
        return y.reshape(b, t, h), aux

    if dispatch_mode == "ragged":
        y, aux = _ragged_moe(xs, logits, moe_params["experts"], x.dtype)
        if "residual_mlp" in moe_params:
            y = _apply_residual(moe_params, xs, y, x.dtype)
        return y.reshape(b, t, h), aux

    if dispatch_mode == "sort":
        d = sort_dispatch(logits, cfg.top_k, capacity)
        xs_pad = jnp.concatenate([xs, jnp.zeros((1, h), xs.dtype)])
        expert_in = xs_pad[d.slot_token].reshape(e, capacity, h)
        aux = d.aux_loss
    else:
        g = gate(logits, cfg.top_k, capacity)
        expert_in = jnp.einsum("sec,sh->ech", g.dispatch.astype(x.dtype), xs)
        aux = g.aux_loss
    if ep_shard:
        from jax.sharding import PartitionSpec as P
        from medplib_tpu.parallel.mesh import AXIS_EXPERT
        expert_in = jax.lax.with_sharding_constraint(
            expert_in, P(AXIS_EXPERT, None, None))

    ek = moe_params["experts"]
    from medplib_tpu.train.lora import dequant_kernel

    def expert_mm(node, xin):
        # int4 "half" experts go through the fused grouped dots (no bf16
        # expert-stack materialization — the flagship's HBM fit-path)
        if "scale4h" in node and node["kernel"].ndim == 3:
            from medplib_tpu.utils.quantize import int4h_expert_einsum
            return int4h_expert_einsum(xin, node["kernel"], node["scale4h"])
        # int8: dequant-first einsum. Two "obvious" improvements were
        # measured SLOWER end-to-end on the flagship (round-3 A/B, B=8
        # full-depth generate): post-dot per-channel rescale 10.50
        # masks/s, per-expert 2D dots (statically unrolled, convert
        # fused into the operand read) 9.37 — vs 11.12 for this
        # formulation, even though the isolated 1-layer profile
        # (profile_moe DECODE=1) preferred them. Inside the real decode
        # scan XLA schedules the dequant-first batch-dot best; keep it.
        return jnp.einsum("ech,ehm->ecm", xin,
                          dequant_kernel(node, x.dtype))

    h1 = expert_mm(ek["gate_proj"], expert_in)
    h2 = expert_mm(ek["up_proj"], expert_in)
    act = jax.nn.silu(h1) * h2
    out_e = expert_mm(ek["down_proj"], act)
    if ep_shard:
        out_e = jax.lax.with_sharding_constraint(
            out_e, P(AXIS_EXPERT, None, None))

    if dispatch_mode == "sort":
        flat_out = jnp.concatenate(
            [out_e.reshape(e * capacity, h), jnp.zeros((1, h), out_e.dtype)])
        contrib = flat_out[d.token_slot] * d.token_prob[:, None].astype(
            out_e.dtype)
        y = jnp.zeros((s, h), x.dtype).at[d.token_src].add(
            contrib.astype(x.dtype))
    else:
        y = jnp.einsum("sec,ech->sh", g.combine.astype(x.dtype), out_e)

    if "residual_mlp" in moe_params:
        y = _apply_residual(moe_params, xs, y, x.dtype)
    return y.reshape(b, t, h), aux


def _apply_residual(moe_params, xs: jnp.ndarray, y: jnp.ndarray,
                    dtype) -> jnp.ndarray:
    """Residual-MoE (deepspeed MoE(use_residual=True), wired at
    medplib_moe_llama.py:60, 613): a dense SwiGLU MLP runs in parallel
    with the experts and the two outputs are mixed by a learned 2-way
    softmax coefficient of the input token."""
    from medplib_tpu.train.lora import dequant_kernel
    from medplib_tpu.train.lora import linear as lora_linear
    rk = moe_params["residual_mlp"]
    r1 = lora_linear(rk["gate_proj"], xs)
    r2 = lora_linear(rk["up_proj"], xs)
    r_out = lora_linear(rk["down_proj"], jax.nn.silu(r1) * r2)
    ck = moe_params["coefficient"]
    # dequant-aware (defense in depth: "coefficient" is also in
    # quantize.SKIP_MODULES like the router — gating layers are
    # numerics-sensitive and tiny)
    coef = xs.astype(jnp.float32) @ dequant_kernel(ck, jnp.float32)
    coef = jax.nn.softmax(coef + ck["bias"].astype(jnp.float32), axis=-1)
    coef = coef.astype(dtype)
    return y * coef[:, 0:1] + r_out * coef[:, 1:2]
