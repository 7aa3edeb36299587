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


def moe_mlp(
    moe_params,
    x: jnp.ndarray,
    cfg: MoeConfig,
    train: bool = True,
    ep_shard: bool = False,
    dispatch_mode: str = "sort",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expert-parallel SwiGLU MoE MLP.

    moe_params: {"router": {"kernel": [H, E]},
                 "experts": {gate_proj|up_proj: {"kernel": [E, H, M]},
                             down_proj: {"kernel": [E, M, H]}}}
    x: [B, T, H] -> ([B, T, H], aux_loss scalar).
    """
    b, t, h = x.shape
    s = b * t
    xs = x.reshape(s, h)
    e = moe_params["router"]["kernel"].shape[-1]
    cf = cfg.capacity_factor if train else cfg.eval_capacity_factor
    capacity = capacity_for(s, e, cf, cfg.min_capacity)

    logits = xs.astype(jnp.float32) @ moe_params["router"]["kernel"].astype(
        jnp.float32)

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
        # Residual-MoE (deepspeed MoE(use_residual=True), wired at
        # medplib_moe_llama.py:60, 613): a dense SwiGLU MLP runs in parallel
        # with the experts and the two outputs are mixed by a learned 2-way
        # softmax coefficient of the input token.
        rk = moe_params["residual_mlp"]
        from medplib_tpu.train.lora import linear as lora_linear
        r1 = lora_linear(rk["gate_proj"], xs)
        r2 = lora_linear(rk["up_proj"], xs)
        r_out = lora_linear(rk["down_proj"], jax.nn.silu(r1) * r2)
        ck = moe_params["coefficient"]
        # dequant-aware (defense in depth: "coefficient" is also in
        # quantize.SKIP_MODULES like the router — gating layers are
        # numerics-sensitive and tiny)
        coef = xs.astype(jnp.float32) @ dequant_kernel(
            ck, jnp.float32)
        coef = jax.nn.softmax(coef + ck["bias"].astype(jnp.float32), axis=-1)
        coef = coef.astype(x.dtype)
        y = y * coef[:, 0:1] + r_out * coef[:, 1:2]
    return y.reshape(b, t, h), aux
