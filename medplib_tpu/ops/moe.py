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


def moe_mlp(
    moe_params,
    x: jnp.ndarray,
    cfg: MoeConfig,
    train: bool = True,
    ep_shard: bool = False,
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
    g = gate(logits, cfg.top_k, capacity)

    dispatch = g.dispatch.astype(x.dtype)
    expert_in = jnp.einsum("sec,sh->ech", dispatch, xs)  # [E, C, H]
    if ep_shard:
        from jax.sharding import PartitionSpec as P
        from medplib_tpu.parallel.mesh import AXIS_EXPERT
        expert_in = jax.lax.with_sharding_constraint(
            expert_in, P(AXIS_EXPERT, None, None))

    ek = moe_params["experts"]
    h1 = jnp.einsum("ech,ehm->ecm", expert_in, ek["gate_proj"]["kernel"])
    h2 = jnp.einsum("ech,ehm->ecm", expert_in, ek["up_proj"]["kernel"])
    act = jax.nn.silu(h1) * h2
    out_e = jnp.einsum("ecm,emh->ech", act, ek["down_proj"]["kernel"])
    if ep_shard:
        out_e = jax.lax.with_sharding_constraint(
            out_e, P(AXIS_EXPERT, None, None))

    y = jnp.einsum("sec,ech->sh", g.combine.astype(x.dtype), out_e)
    return y.reshape(b, t, h), g.aux_loss
