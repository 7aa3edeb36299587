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


def make_moe_mlp_apply(cfg: LlamaConfig, moe_cfg: MoeConfig,
                       train: bool = True, ep_shard: bool = False):
    """MlpApply closure for llama.forward / forward_decode."""
    flags = moe_flags(cfg, moe_cfg)
    all_moe = bool(np.all(np.asarray(flags) == 1))

    def apply(layer_p: Params, x: jnp.ndarray):
        def moe_branch(_):
            return moe_mlp(layer_p["moe"], x, moe_cfg, train=train,
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
            unroll: bool = False):
    """-> (hidden_post_norm, cache', router_aux_loss_sum)."""
    mlp_apply = make_moe_mlp_apply(cfg, moe_cfg, train=train,
                                   ep_shard=ep_shard)
    return llama.forward(_with_flags(params, cfg, moe_cfg), cfg, input_embeds,
                         attn_mask, positions, mlp_apply, cache, remat,
                         unroll)


def forward_decode(params: Params, cfg: LlamaConfig, moe_cfg: MoeConfig,
                   input_embeds, cache, ep_shard: bool = False,
                   unroll: bool = False):
    mlp_apply = make_moe_mlp_apply(cfg, moe_cfg, train=False,
                                   ep_shard=ep_shard)
    return llama.forward_decode(_with_flags(params, cfg, moe_cfg), cfg,
                                input_embeds, cache, mlp_apply, unroll)


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
