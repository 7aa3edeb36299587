"""MoE LLaMA: the dense decoder with per-layer mixture-of-experts MLPs.

Rebuild of `MedPLIBMoELlamaForCausalLM`
(/root/reference/model/medplib/model/language_model/medplib_moe_llama.py):
the reference wraps selected layers' MLPs in deepspeed `MoE` and patches
forwards to thread per-layer aux losses (110-162, 324-438). Here the MoE MLP
is an `mlp_apply` plug-in to the shared scanned decoder block
(models/llama.py), so prefill/decode/KV-cache logic is written once.

Layer selection (moe_mode dense/sparse/first_half/second_half/custom,
medplib_moe_llama.py:576-600) is encoded as a static per-layer 0/1 flag array
scanned alongside the params; non-MoE layers take the dense-MLP branch of a
`lax.cond`. MoE params are stacked over ALL layers for scan uniformity — for
the flagship config (moe_mode=dense: every layer, train_stage4.sh) there is
no waste.

Expert "surgery" — seeding expert 0 from the stage-3 seg checkpoint and
expert 1 from the stage-2 VQA checkpoint (medplib_moe_llama.py:536-561) — is
`build_experts_from_donors`.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.config import LlamaConfig, MoeConfig
from medplib_tpu.models import llama
from medplib_tpu.ops.moe import moe_mlp

Params = Dict[str, Any]


def init_moe_llama(key, cfg: LlamaConfig, moe_cfg: MoeConfig,
                   dtype=jnp.float32, vocab_size: Optional[int] = None) -> Params:
    params = llama.init_llama(key, cfg, dtype, vocab_size)
    k1, k2 = jax.random.split(key)
    e = moe_cfg.num_experts
    h, m = cfg.hidden_size, cfg.intermediate_size
    L = cfg.num_layers

    def init_experts(k):
        ks = jax.random.split(k, 3)
        scale_h, scale_m = h ** -0.5, m ** -0.5
        return {
            "gate_proj": {"kernel": (jax.random.normal(ks[0], (e, h, m))
                                     * scale_h).astype(dtype)},
            "up_proj": {"kernel": (jax.random.normal(ks[1], (e, h, m))
                                   * scale_h).astype(dtype)},
            "down_proj": {"kernel": (jax.random.normal(ks[2], (e, m, h))
                                     * scale_m).astype(dtype)},
        }

    experts = jax.vmap(init_experts)(jax.random.split(k1, L))
    routers = (jax.random.normal(k2, (L, h, e)) * h ** -0.5).astype(dtype)
    params["layers"]["moe"] = {
        "router": {"kernel": routers},
        "experts": experts,
    }
    if moe_cfg.use_residual:
        # Residual-MoE (deepspeed MoE(use_residual=True),
        # medplib_moe_llama.py:60, 613): dense SwiGLU copy + learned 2-way
        # mixing coefficient. Seeded from the pre-conversion dense MLP like
        # deepspeed's copy.deepcopy(expert).
        # jnp.copy: distinct buffers so trainer donation never aliases the
        # dense stack with the residual copy
        params["layers"]["moe"]["residual_mlp"] = jax.tree_util.tree_map(
            jnp.copy, params["layers"]["mlp"])
        k3 = jax.random.fold_in(k2, 1)
        params["layers"]["moe"]["coefficient"] = {
            "kernel": (jax.random.normal(k3, (L, h, 2)) * h ** -0.5
                       ).astype(dtype),
            "bias": jnp.zeros((L, 2), dtype),
        }
    return params


def strip_dense_mlp(params: Params, cfg: LlamaConfig,
                    moe_cfg: MoeConfig) -> Params:
    """Drop the dense MLP stack when EVERY layer is MoE (moe_mode=dense,
    the flagship): init_llama's mlp kernels are then dead weight — 8.6 GB
    bf16 at 7B — that would otherwise ride the layer scan as unused xs.
    Mixed modes keep it (the lax.cond dense branch reads it). Mutates."""
    idx = moe_cfg.layer_indices(cfg.num_layers)
    if len(idx) == cfg.num_layers and "mlp" in params["layers"]:
        del params["layers"]["mlp"]
    return params


def moe_flags(cfg: LlamaConfig, moe_cfg: MoeConfig) -> np.ndarray:
    """[L] int32, 1 where the layer MLP is MoE. Plain numpy so it stays a
    compile-time constant even when computed inside a trace."""
    idx = set(moe_cfg.layer_indices(cfg.num_layers))
    return np.asarray([1 if i in idx else 0
                       for i in range(cfg.num_layers)], np.int32)


def mesh_ep_shards() -> tuple:
    """(expert_axis_size, data*expert row shards) of the ambient mesh —
    1,1 outside any mesh. Trace-time static (AbstractMesh shape)."""
    try:
        from jax.sharding import get_abstract_mesh
        shape = dict(get_abstract_mesh().shape)
    except Exception:
        return 1, 1
    from medplib_tpu.parallel.mesh import AXIS_DATA, AXIS_EXPERT
    ep = int(shape.get(AXIS_EXPERT, 1))
    return ep, int(shape.get(AXIS_DATA, 1)) * ep


def stack_experts_for_gmm(experts: Params, moe_cfg: MoeConfig,
                          s_tokens: int, train: bool,
                          ep_shard: bool,
                          decode: bool = False,
                          ep: int = 1,
                          row_shards: int = 1) -> Optional[Params]:
    """Whole-stack layer-indexed expert view for the Pallas grouped matmul.

    Returns the experts node with kernels reshaped [L, E, ...] ->
    [L*E, ...] (a free view) when the gmm dispatch is EXACTLY equivalent
    to the capacity semantics AND every node can stream through the
    kernel without any internal padding copy, else None. mlp_apply then
    passes this single loop-invariant operand plus a per-layer gid offset
    to ops/moe.moe_mlp instead of letting lax.scan slice the expert
    stacks per layer — a pallas_call operand produced by dynamic-slice is
    otherwise MATERIALIZED every layer (270 MB/layer for the int8
    flagship; also the HLO-temp pressure that kept batch 10 from
    fitting). Shape preconditions come pre-satisfied by
    utils/quantize.pad_moe_experts_for_gmm (M padded to 1024).

    ep_shard + ep>1 (expert mesh axis): the EXPERT-PARALLEL variant
    (ops/moe._gmm_moe_ep). Kernels are returned UNRESHAPED [L, E, ...] —
    merging [L, E] with E sharded on `expert` is not a free GSPMD
    resharding (it would all-gather the stacks); the per-shard
    [L*E/ep, ...] view is taken inside the shard_map instead. Needs
    E % ep == 0 and S % (data*expert) == 0 (shard_map row specs)."""
    if train or moe_cfg.top_k != 1:
        return None
    ep_mode = ep_shard and ep > 1
    if ep_shard and not ep_mode:
        return None   # ep_shard requested but no expert mesh axis in scope
    e = moe_cfg.num_experts
    if ep_mode and (e % ep != 0 or s_tokens % max(row_shards, 1) != 0):
        return None
    from medplib_tpu.ops.moe import capacity_for
    from medplib_tpu.ops.pallas.gmm import _pick_bk

    cap = capacity_for(s_tokens, e, moe_cfg.eval_capacity_factor,
                       moe_cfg.min_capacity)
    if cap < s_tokens:
        return None   # sort could drop tokens: gmm would not be equivalent
    if s_tokens < 1024 and not decode:
        return None   # prefill heuristic: sort wins at small S (profile_moe)

    def view(a):
        return a if ep_mode else a.reshape((-1,) + a.shape[2:])

    out = {}
    for n in ("gate_proj", "up_proj", "down_proj"):
        node = experts[n]
        k = node["kernel"]
        if getattr(k, "ndim", 0) != 4 or k.shape[1] != e:
            return None
        if "scale" in node and k.dtype == jnp.int8:
            if _pick_bk(k.shape[-2])[1] != 0 or k.shape[-1] % 512 != 0:
                return None  # would need an in-scan padding copy
            out[n] = {"kernel": view(k), "scale": view(node["scale"])}
        elif ("scale4h" in node and node["scale4h"].shape[-3] == 2
              and k.shape[-2] % 128 == 0 and k.shape[-1] % 512 == 0):
            out[n] = {"kernel": view(k), "scale4h": view(node["scale4h"])}
        else:
            return None  # bf16/int4-block: per-layer dequant path instead
    return out


def make_moe_mlp_apply(cfg: LlamaConfig, moe_cfg: MoeConfig,
                       train: bool = True, ep_shard: bool = False,
                       stacked_experts: Optional[Params] = None,
                       gmm_block_m: Optional[int] = None,
                       ep_size: int = 1):
    """MlpApply closure for llama.forward / forward_decode. ep_size > 1
    marks the stacked experts as expert-mesh-sharded: the gid offset then
    indexes the per-shard [L*E/ep] stack and moe_mlp routes to the
    expert-parallel gmm."""
    flags = moe_flags(cfg, moe_cfg)
    all_moe = bool(np.all(np.asarray(flags) == 1))
    e_per_shard = moe_cfg.num_experts // max(ep_size, 1)

    def apply(layer_p: Params, x: jnp.ndarray):
        def moe_branch(_):
            mp = layer_p["moe"]
            if stacked_experts is not None:
                mp = dict(mp)
                mp["experts"] = stacked_experts
                mp["gid_offset"] = layer_p["layer_idx"] * e_per_shard
                if ep_size > 1:
                    mp["ep_size"] = ep_size
                if gmm_block_m is not None:
                    mp["gmm_block_m"] = gmm_block_m
                return moe_mlp(mp, x, moe_cfg, train=train,
                               ep_shard=ep_shard, dispatch_mode="gmm")
            return moe_mlp(mp, x, moe_cfg, train=train,
                           ep_shard=ep_shard)

        def dense_branch(_):
            return (llama.dense_mlp(layer_p["mlp"], x),
                    jnp.zeros((), jnp.float32))

        if all_moe:
            return moe_branch(None)
        # layer flag is carried inside the scanned params by forward();
        # see forward()'s params threading below
        return jax.lax.cond(layer_p["moe_flag"] > 0, moe_branch, dense_branch,
                            None)

    return apply


def _with_flags(params: Params, cfg: LlamaConfig, moe_cfg: MoeConfig) -> Params:
    layers = dict(params["layers"])
    layers["moe_flag"] = moe_flags(cfg, moe_cfg)
    p = dict(params)
    p["layers"] = layers
    return p


def forward(params: Params, cfg: LlamaConfig, moe_cfg: MoeConfig,
            input_embeds, attn_mask=None, positions=None, cache=None,
            remat: bool = False, train: bool = True, ep_shard: bool = False,
            unroll: bool = False, use_stacked_gmm: Optional[bool] = None):
    """-> (hidden_post_norm, cache', router_aux_loss_sum).

    use_stacked_gmm: None (auto — engage the whole-stack layer-indexed
    gmm dispatch whenever stack_experts_for_gmm deems it exact and
    pad-free), or force off (False) for A/Bs and tests. Under an
    expert-sharded mesh (ep_shard + expert axis > 1) the stacked path is
    the EXPERT-PARALLEL gmm (ops/moe._gmm_moe_ep); ineligible shapes fall
    back to the capacity-sort dispatch with GSPMD sharding constraints."""
    flags = moe_flags(cfg, moe_cfg)
    stacked = None
    ep, row_shards = mesh_ep_shards() if ep_shard else (1, 1)
    if use_stacked_gmm is None and \
            os.environ.get("MEDPLIB_STACK_MOE", "1") != "1":
        use_stacked_gmm = False   # diagnostic A/B kill-switch
    if use_stacked_gmm is not False and bool(np.all(flags == 1)):
        b, t = input_embeds.shape[:2]
        stacked = stack_experts_for_gmm(
            params["layers"]["moe"]["experts"], moe_cfg, b * t, train,
            ep_shard, ep=ep, row_shards=row_shards)
    mlp_apply = make_moe_mlp_apply(cfg, moe_cfg, train=train,
                                   ep_shard=ep_shard,
                                   stacked_experts=stacked,
                                   ep_size=ep if stacked is not None else 1)
    p = _with_flags(params, cfg, moe_cfg)
    if stacked is not None:
        # the expert stacks must NOT ride the scan as xs (that is the
        # per-layer slice materialization this path removes); the layer
        # index rides instead and addresses the whole-stack operand
        layers = dict(p["layers"])
        moe = dict(layers["moe"])
        del moe["experts"]
        layers["moe"] = moe
        layers["layer_idx"] = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        p["layers"] = layers
    return llama.forward(p, cfg, input_embeds,
                         attn_mask, positions, mlp_apply, cache, remat,
                         unroll)


def forward_decode(params: Params, cfg: LlamaConfig, moe_cfg: MoeConfig,
                   input_embeds, cache, ep_shard: bool = False,
                   unroll: bool = False):
    """Decode step. The per-step expert MLP routes through the whole-stack
    Pallas gmm at a tiny m-tile (block_m=32) — instead of the
    capacity-sort einsum — BY DEFAULT for int4h(G=2) expert trees: their
    sort-path contraction measures ~1.65 ms/layer at T=1 vs a ~0.17 ms
    weight-traffic roofline (the nibble unpack does not stay fused), and
    the composed flagship A/B wins (12.66-12.73 vs 12.58-12.60 masks/s).
    int8 experts keep the dequant-first sort einsum (gmm measured 10.78 vs
    11.13 composed — XLA schedules that one better inside the decode
    scan). MEDPLIB_DECODE_GMM=1/0 forces either way. Same zero-drop
    equivalence conditions as prefill (stack_experts_for_gmm)."""
    flags = moe_flags(cfg, moe_cfg)
    stacked = None
    env = os.environ.get("MEDPLIB_DECODE_GMM", "")
    experts = params["layers"]["moe"]["experts"] if "moe" in \
        params["layers"] else None
    int4h = (experts is not None
             and "scale4h" in experts.get("gate_proj", {})
             and experts["gate_proj"]["scale4h"].shape[-3] == 2)
    want = env == "1" or (env != "0" and int4h)
    ep, row_shards = mesh_ep_shards() if ep_shard else (1, 1)
    if want and bool(np.all(flags == 1)):
        b = input_embeds.shape[0]
        stacked = stack_experts_for_gmm(
            experts, moe_cfg, b, train=False,
            ep_shard=ep_shard, decode=True, ep=ep, row_shards=row_shards)
    bm = int(os.environ.get("MEDPLIB_DECODE_GMM_BM", "32"))
    mlp_apply = make_moe_mlp_apply(cfg, moe_cfg, train=False,
                                   ep_shard=ep_shard,
                                   stacked_experts=stacked,
                                   gmm_block_m=bm if stacked else None,
                                   ep_size=ep if stacked is not None else 1)
    p = _with_flags(params, cfg, moe_cfg)
    if stacked is not None:
        layers = dict(p["layers"])
        moe = dict(layers["moe"])
        del moe["experts"]
        layers["moe"] = moe
        layers["layer_idx"] = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        p["layers"] = layers
    return llama.forward_decode(p, cfg, input_embeds, cache, mlp_apply,
                                unroll)


def forward_extend(params: Params, cfg: LlamaConfig, moe_cfg: MoeConfig,
                   input_embeds, cache, c0, ep_shard: bool = False):
    """Chunked-prefill extend with the MoE MLP: the chunk's B*C tokens
    route through the same whole-stack gmm dispatch as prefill
    (stack_experts_for_gmm at S = B*C) — one expert-stack operand shared
    across the layer scan, no per-layer slice copies."""
    flags = moe_flags(cfg, moe_cfg)
    stacked = None
    ep, row_shards = mesh_ep_shards() if ep_shard else (1, 1)
    if os.environ.get("MEDPLIB_STACK_MOE", "1") == "1" and \
            bool(np.all(flags == 1)):
        b, t = input_embeds.shape[:2]
        stacked = stack_experts_for_gmm(
            params["layers"]["moe"]["experts"], moe_cfg, b * t, train=False,
            ep_shard=ep_shard, ep=ep, row_shards=row_shards)
    mlp_apply = make_moe_mlp_apply(cfg, moe_cfg, train=False,
                                   ep_shard=ep_shard,
                                   stacked_experts=stacked,
                                   ep_size=ep if stacked is not None else 1)
    p = _with_flags(params, cfg, moe_cfg)
    if stacked is not None:
        layers = dict(p["layers"])
        moe = dict(layers["moe"])
        del moe["experts"]
        layers["moe"] = moe
        layers["layer_idx"] = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        p["layers"] = layers
    return llama.forward_extend(p, cfg, input_embeds, cache, c0, mlp_apply)


def build_experts_from_donors(donor_mlp_stacks) -> Params:
    """Expert surgery (medplib_moe_llama.py:536-561): expert e of every MoE
    layer is initialized from donor checkpoint e's dense MLP weights
    (e=0: stage-3 seg specialist, e=1: stage-2 VQA specialist).

    donor_mlp_stacks: list over experts of {"gate_proj"/"up_proj"/
    "down_proj": {"kernel": [L, in, out]}} trees (each from llama_from_hf).
    -> stacked experts tree with kernels [L, E, in, out].
    """
    out = {}
    for n in ("gate_proj", "up_proj", "down_proj"):
        ks = [np.asarray(d[n]["kernel"]) for d in donor_mlp_stacks]
        out[n] = {"kernel": np.stack(ks, axis=1)}  # [L, E, in, out]
    return out
