"""Weight translation: HF/PyTorch state dicts -> medplib_tpu param trees.

Loads the released reference checkpoints (Huangxs/MedPLIB-7b-2e,
sam-med2d_b.pth, openai/clip-vit-large-patch14-336 — /root/reference/
README.md:183, model/medplib/model/builder.py:154-188) into this framework
for bit-parity evaluation. Accepts torch tensors or numpy arrays; everything
is converted to numpy on the host, transposed to our [in, out] kernel layout,
and per-layer weights are stacked along a leading layer dim for scan.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from medplib_tpu.config import ClipVisionConfig, LlamaConfig, SamConfig


def to_np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (bf16 needs an f32 hop — numpy has no bfloat16)
    try:
        import torch
        if isinstance(x, torch.Tensor):
            return x.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def _stack(sd: Mapping[str, Any], template: str, num: int, transpose=False):
    ws = []
    for i in range(num):
        w = to_np(sd[template.format(i=i)])
        ws.append(w.T if transpose else w)
    return np.stack(ws)


def _linear(sd, prefix, transpose=True, bias=True):
    out = {"kernel": to_np(sd[prefix + ".weight"]).T if transpose
           else to_np(sd[prefix + ".weight"])}
    if bias and prefix + ".bias" in sd:
        out["bias"] = to_np(sd[prefix + ".bias"])
    return out


# ---------------------------------------------------------------------------
# LLaMA
# ---------------------------------------------------------------------------

def llama_from_hf(sd: Mapping[str, Any], cfg: LlamaConfig,
                  prefix: str = "model.") -> Dict[str, Any]:
    """HF LlamaForCausalLM state dict -> init_llama()-shaped tree.

    `prefix` is the path to the LlamaModel inside the checkpoint ("model."
    for a plain HF export; "model.model." layouts should be pre-stripped).
    """
    L = cfg.num_layers
    lt = prefix + "layers.{i}."

    def stk(sub, transpose=True):
        return _stack(sd, lt + sub + ".weight", L, transpose=transpose)

    layers = {
        "input_layernorm": {"weight": stk("input_layernorm", transpose=False)},
        "attn": {
            # q/k/v stay in torch's [out, in] layout (decode-major storage,
            # models/llama.py init_layer)
            "q_proj": {"kernel": stk("self_attn.q_proj", transpose=False)},
            "k_proj": {"kernel": stk("self_attn.k_proj", transpose=False)},
            "v_proj": {"kernel": stk("self_attn.v_proj", transpose=False)},
            "o_proj": {"kernel": stk("self_attn.o_proj")},
        },
        "post_attention_layernorm": {
            "weight": stk("post_attention_layernorm", transpose=False)},
        "mlp": {
            "gate_proj": {"kernel": stk("mlp.gate_proj")},
            "up_proj": {"kernel": stk("mlp.up_proj")},
            "down_proj": {"kernel": stk("mlp.down_proj")},
        },
    }
    return {
        "embed_tokens": {
            "embedding": to_np(sd[prefix + "embed_tokens.weight"])},
        "layers": layers,
        "norm": {"weight": to_np(sd[prefix + "norm.weight"])},
        "lm_head": {"kernel": to_np(sd["lm_head.weight"]).T},
    }


def moe_llama_from_hf(sd: Mapping[str, Any], cfg: LlamaConfig,
                      moe_layer_indices, num_experts: int,
                      prefix: str = "model.") -> Dict[str, Any]:
    """MedPLIB MoE export -> moe_llama tree. DeepSpeed MoE layers appear in
    merged HF checkpoints as
      layers.{i}.mlp.deepspeed_moe.gate.wg.weight          [E, H]
      layers.{i}.mlp.deepspeed_moe.experts.deepspeed_experts.{e}.{gate,up,down}_proj.weight
    (reference merge tool: merge_lora_weights_and_save_hf_model_moe.py).

    Router/expert stacks cover ALL layers (scan uniformity, see
    models/moe_llama.py); rows for non-MoE layers are zeros and never read.
    """
    params = llama_from_hf(
        {k: v for k, v in sd.items()
         if ".mlp.deepspeed_moe" not in k} | _dense_mlp_placeholder(sd, cfg, prefix),
        cfg, prefix)
    lt = prefix + "layers.{i}.mlp.deepspeed_moe."
    h, m = cfg.hidden_size, cfg.intermediate_size
    moe_set = set(moe_layer_indices)
    routers, gk, uk, dk = [], [], [], []
    for i in range(cfg.num_layers):
        if i in moe_set:
            base = lt.format(i=i)
            routers.append(to_np(sd[base + "gate.wg.weight"]).T)
            for name, acc in (("gate_proj", gk), ("up_proj", uk),
                              ("down_proj", dk)):
                ws = [to_np(
                    sd[f"{base}experts.deepspeed_experts.{e}.{name}.weight"]).T
                    for e in range(num_experts)]
                acc.append(np.stack(ws))
        else:
            routers.append(np.zeros((h, num_experts), np.float32))
            gk.append(np.zeros((num_experts, h, m), np.float32))
            uk.append(np.zeros((num_experts, h, m), np.float32))
            dk.append(np.zeros((num_experts, m, h), np.float32))
    params["layers"]["moe"] = {
        "router": {"kernel": np.stack(routers)},
        "experts": {
            "gate_proj": {"kernel": np.stack(gk)},
            "up_proj": {"kernel": np.stack(uk)},
            "down_proj": {"kernel": np.stack(dk)},
        },
    }

    # Residual-MoE (deepspeed MoE(use_residual=True)): the dense copy is
    # `layers.{i}.mlp.mlp.*`, the mixing head `layers.{i}.mlp.coefficient.*`.
    res_probe = prefix + "layers.{i}.mlp.mlp.gate_proj.weight"
    if any(res_probe.format(i=i) in sd for i in moe_set):
        rgk, ruk, rdk, ck, cb = [], [], [], [], []
        for i in range(cfg.num_layers):
            rb = prefix + f"layers.{i}.mlp."
            if i in moe_set and rb + "mlp.gate_proj.weight" in sd:
                rgk.append(to_np(sd[rb + "mlp.gate_proj.weight"]).T)
                ruk.append(to_np(sd[rb + "mlp.up_proj.weight"]).T)
                rdk.append(to_np(sd[rb + "mlp.down_proj.weight"]).T)
                ck.append(to_np(sd[rb + "coefficient.weight"]).T)
                cb.append(to_np(sd[rb + "coefficient.bias"]))
            else:
                rgk.append(np.zeros((h, m), np.float32))
                ruk.append(np.zeros((h, m), np.float32))
                rdk.append(np.zeros((m, h), np.float32))
                ck.append(np.zeros((h, 2), np.float32))
                cb.append(np.zeros((2,), np.float32))
        params["layers"]["moe"]["residual_mlp"] = {
            "gate_proj": {"kernel": np.stack(rgk)},
            "up_proj": {"kernel": np.stack(ruk)},
            "down_proj": {"kernel": np.stack(rdk)},
        }
        params["layers"]["moe"]["coefficient"] = {
            "kernel": np.stack(ck), "bias": np.stack(cb)}
    return params


def _dense_mlp_placeholder(sd, cfg: LlamaConfig, prefix):
    """MoE-converted layers have no dense mlp weights in the checkpoint; fill
    zeros so llama_from_hf's stacking succeeds (scan needs uniform shapes;
    the MoE path never reads them)."""
    out = {}
    h, m = cfg.hidden_size, cfg.intermediate_size
    for i in range(cfg.num_layers):
        for name, shape in (("gate_proj", (m, h)), ("up_proj", (m, h)),
                            ("down_proj", (h, m))):
            key = f"{prefix}layers.{i}.mlp.{name}.weight"
            if key not in sd:
                out[key] = np.zeros(shape, np.float32)
    return out


# ---------------------------------------------------------------------------
# CLIP vision tower (openai/clip-vit-large-patch14-336, HF CLIPVisionModel)
# ---------------------------------------------------------------------------

def clip_vision_from_hf(sd: Mapping[str, Any], cfg: ClipVisionConfig,
                        prefix: str = "vision_model.") -> Dict[str, Any]:
    L = cfg.num_layers
    lt = prefix + "encoder.layers.{i}."

    def stk_lin(sub):
        return {
            "kernel": _stack(sd, lt + sub + ".weight", L, transpose=True),
            "bias": _stack(sd, lt + sub + ".bias", L),
        }

    def stk_ln(sub):
        return {"weight": _stack(sd, lt + sub + ".weight", L),
                "bias": _stack(sd, lt + sub + ".bias", L)}

    # HF conv weight [out, in, kh, kw] -> HWIO [kh, kw, in, out]
    conv = to_np(sd[prefix + "embeddings.patch_embedding.weight"])
    return {
        "embeddings": {
            "class_embedding": to_np(sd[prefix + "embeddings.class_embedding"]),
            "patch_embedding": {"kernel": conv.transpose(2, 3, 1, 0)},
            "position_embedding": {
                "embedding": to_np(
                    sd[prefix + "embeddings.position_embedding.weight"])},
        },
        "pre_layrnorm": {
            "weight": to_np(sd[prefix + "pre_layrnorm.weight"]),
            "bias": to_np(sd[prefix + "pre_layrnorm.bias"])},
        "layers": {
            "layer_norm1": stk_ln("layer_norm1"),
            "layer_norm2": stk_ln("layer_norm2"),
            "attn": {
                "q_proj": stk_lin("self_attn.q_proj"),
                "k_proj": stk_lin("self_attn.k_proj"),
                "v_proj": stk_lin("self_attn.v_proj"),
                "out_proj": stk_lin("self_attn.out_proj"),
            },
            "mlp": {"fc1": stk_lin("mlp.fc1"), "fc2": stk_lin("mlp.fc2")},
        },
        "post_layernorm": {
            "weight": to_np(sd[prefix + "post_layernorm.weight"]),
            "bias": to_np(sd[prefix + "post_layernorm.bias"])},
    }


# ---------------------------------------------------------------------------
# SAM-Med2D (sam-med2d_b.pth: {"model": {...}} with image_encoder/
# prompt_encoder/mask_decoder subtrees; build_sam.py:123-148)
# ---------------------------------------------------------------------------

def sam_from_torch(sd: Mapping[str, Any], cfg: SamConfig) -> Dict[str, Any]:
    if "model" in sd and not any(k.startswith("image_encoder") for k in sd):
        sd = sd["model"]
    enc = {}
    p = "image_encoder."
    conv = to_np(sd[p + "patch_embed.proj.weight"])
    enc["patch_embed"] = {"kernel": conv.transpose(2, 3, 1, 0),
                          "bias": to_np(sd[p + "patch_embed.proj.bias"])}
    pos = to_np(sd[p + "pos_embed"])  # [1, Hp, Wp, C] (at ckpt res)
    enc["pos_embed"] = pos
    L = cfg.encoder_depth
    lt = p + "blocks.{i}."

    def stk_lin(sub, bias=True):
        d = {"kernel": _stack(sd, lt + sub + ".weight", L, transpose=True)}
        if bias:
            d["bias"] = _stack(sd, lt + sub + ".bias", L)
        return d

    def stk_ln(sub):
        return {"weight": _stack(sd, lt + sub + ".weight", L),
                "bias": _stack(sd, lt + sub + ".bias", L)}

    def stk_rel_pos(sub):
        # window blocks have [2*ws-1, d] tables, global blocks [2*grid-1, d];
        # pad to the max so the block stack is uniform (apply code only
        # indexes rows < 2*size-1, padding is never read)
        ws = [to_np(sd[lt.format(i=i) + sub]) for i in range(L)]
        max_len = max(w.shape[0] for w in ws)
        return np.stack([
            np.pad(w, ((0, max_len - w.shape[0]), (0, 0))) for w in ws])

    blocks = {
        "norm1": stk_ln("norm1"),
        "attn": {
            "qkv": stk_lin("attn.qkv"),
            "proj": stk_lin("attn.proj"),
            "rel_pos_h": stk_rel_pos("attn.rel_pos_h"),
            "rel_pos_w": stk_rel_pos("attn.rel_pos_w"),
        },
        "norm2": stk_ln("norm2"),
        "mlp": {"lin1": stk_lin("mlp.lin1"), "lin2": stk_lin("mlp.lin2")},
    }
    if cfg.use_adapter:
        # Adapter_Layer per block (image_encoder.py:18-56): SE channel gate
        # (channel.0/channel.2 linears, no bias), spatial conv (spatial.0) +
        # convtranspose (spatial.2, kept in torch [Cin,Cout,kh,kw] layout —
        # converted at apply time), then LayerNorm.
        blocks["adapter"] = {
            "channel_fc1": {"kernel": _stack(
                sd, lt + "Adapter.channel.0.weight", L, transpose=True)},
            "channel_fc2": {"kernel": _stack(
                sd, lt + "Adapter.channel.2.weight", L, transpose=True)},
            "spatial_conv": {"kernel": np.stack([
                to_np(sd[lt.format(i=i) + "Adapter.spatial.0.weight"]
                      ).transpose(2, 3, 1, 0) for i in range(L)])},
            "spatial_convt": {"kernel": _stack(
                sd, lt + "Adapter.spatial.2.weight", L)},
            "norm": stk_ln("Adapter.norm"),
        }
    enc["blocks"] = blocks
    enc["neck"] = {
        "conv1": {"kernel": to_np(sd[p + "neck.0.weight"]).transpose(2, 3, 1, 0)},
        "ln1": {"weight": to_np(sd[p + "neck.1.weight"]),
                "bias": to_np(sd[p + "neck.1.bias"])},
        "conv2": {"kernel": to_np(sd[p + "neck.2.weight"]).transpose(2, 3, 1, 0)},
        "ln2": {"weight": to_np(sd[p + "neck.3.weight"]),
                "bias": to_np(sd[p + "neck.3.bias"])},
    }

    pe = {
        "pe_layer": {"gaussian_matrix": to_np(
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"])},
        "point_embeddings": np.stack([
            to_np(sd[f"prompt_encoder.point_embeddings.{i}.weight"])[0]
            for i in range(4)]),
        "not_a_point_embed": to_np(
            sd["prompt_encoder.not_a_point_embed.weight"])[0],
        "no_mask_embed": to_np(sd["prompt_encoder.no_mask_embed.weight"])[0],
        "mask_downscaling": _sam_mask_downscaling(sd),
    }

    md = _sam_mask_decoder(sd, cfg)
    return {"image_encoder": enc, "prompt_encoder": pe, "mask_decoder": md}


def _sam_mask_downscaling(sd):
    p = "prompt_encoder.mask_downscaling."
    def conv(i):
        return {"kernel": to_np(sd[p + f"{i}.weight"]).transpose(2, 3, 1, 0),
                "bias": to_np(sd[p + f"{i}.bias"])}
    def ln(i):
        return {"weight": to_np(sd[p + f"{i}.weight"]),
                "bias": to_np(sd[p + f"{i}.bias"])}
    return {"conv1": conv(0), "ln1": ln(1), "conv2": conv(3), "ln2": ln(4),
            "conv3": conv(6)}


def _sam_mask_decoder(sd, cfg: SamConfig):
    p = "mask_decoder."

    def lin(name):
        return _linear(sd, p + name)

    def mlp_list(template, n_layers):
        return [{"kernel": to_np(sd[template.format(i=i) + ".weight"]).T,
                 "bias": to_np(sd[template.format(i=i) + ".bias"])}
                for i in range(n_layers)]

    def attn_block(prefix):
        return {n: lin(prefix + "." + n)
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")}

    def ln(name):
        return {"weight": to_np(sd[p + name + ".weight"]),
                "bias": to_np(sd[p + name + ".bias"])}

    tl = []
    for i in range(cfg.decoder_depth):
        b = f"transformer.layers.{i}"
        tl.append({
            "self_attn": attn_block(b + ".self_attn"),
            "norm1": ln(b + ".norm1"),
            "cross_attn_token_to_image": attn_block(
                b + ".cross_attn_token_to_image"),
            "norm2": ln(b + ".norm2"),
            "mlp": {"lin1": lin(b + ".mlp.lin1"), "lin2": lin(b + ".mlp.lin2")},
            "norm3": ln(b + ".norm3"),
            "cross_attn_image_to_token": attn_block(
                b + ".cross_attn_image_to_token"),
            "norm4": ln(b + ".norm4"),
        })
    num_mask_tokens = cfg.num_multimask_outputs + 1
    return {
        "iou_token": to_np(sd[p + "iou_token.weight"]),
        "mask_tokens": to_np(sd[p + "mask_tokens.weight"]),
        "transformer": {
            "layers": tl,
            "final_attn_token_to_image": attn_block(
                "transformer.final_attn_token_to_image"),
            "norm_final_attn": ln("transformer.norm_final_attn"),
        },
        "output_upscaling": {
            "convt1": {"kernel": to_np(
                sd[p + "output_upscaling.0.weight"]),
                "bias": to_np(sd[p + "output_upscaling.0.bias"])},
            "ln": {"weight": to_np(sd[p + "output_upscaling.1.weight"]),
                   "bias": to_np(sd[p + "output_upscaling.1.bias"])},
            "convt2": {"kernel": to_np(
                sd[p + "output_upscaling.3.weight"]),
                "bias": to_np(sd[p + "output_upscaling.3.bias"])},
        },
        "output_hypernetworks_mlps": [
            mlp_list(p + f"output_hypernetworks_mlps.{m}.layers.{{i}}", 3)
            for m in range(num_mask_tokens)],
        "iou_prediction_head": mlp_list(
            p + "iou_prediction_head.layers.{i}", cfg.iou_head_depth),
    }


def cast_tree(tree, dtype):
    import jax
    import jax.numpy as jnp

    def cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x
    return jax.tree_util.tree_map(cast, tree)
