"""Inverse weight translation: medplib_tpu param trees -> HF/torch state dicts.

Re-exports merged checkpoints in the exact layout the reference's merge tools
emit (/root/reference/merge_lora_weights_and_save_hf_model_moe.py:322-344,
params_bf16_to_f32.py:5-50), so a tree trained or merged in this framework can
be consumed by the reference's builder (model/medplib/model/builder.py:154-208)
and the wider HF ecosystem.

Exact inverse of utils/hf_weights.py: `to_hf(from_hf(sd)) == sd` key-for-key
(tests/test_hf_export.py), including the DeepSpeed MoE expert naming
(`layers.{i}.mlp.deepspeed_moe.experts.deepspeed_experts.{e}.*`), the
Residual-MoE dense copy (`layers.{i}.mlp.mlp.*` + `coefficient.*`), and the
SAM-Med2D `model.visual_model.*` copy carried inside merged checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Mapping, Optional

import numpy as np

from medplib_tpu.config import LlamaConfig, MedplibConfig, SamConfig


def _np(x) -> np.ndarray:
    """Host numpy view of a leaf, preserving dtype (bf16 via ml_dtypes)."""
    return np.asarray(x)


# ---------------------------------------------------------------------------
# LLaMA (inverse of hf_weights.llama_from_hf)
# ---------------------------------------------------------------------------

def llama_to_hf(params: Mapping[str, Any], cfg: LlamaConfig,
                prefix: str = "model.") -> Dict[str, np.ndarray]:
    """init_llama()-shaped tree -> HF LlamaForCausalLM state dict.

    q/k/v kernels are stored decode-major in torch's [out, in] layout
    (models/llama.py init_layer) so they export verbatim; o_proj and the MLP
    kernels are [in, out] and transpose back.
    """
    sd: Dict[str, np.ndarray] = {
        prefix + "embed_tokens.weight": _np(
            params["embed_tokens"]["embedding"]),
        prefix + "norm.weight": _np(params["norm"]["weight"]),
        "lm_head.weight": _np(params["lm_head"]["kernel"]).T,
    }
    layers = params["layers"]
    for i in range(cfg.num_layers):
        p = f"{prefix}layers.{i}."
        sd[p + "input_layernorm.weight"] = _np(
            layers["input_layernorm"]["weight"])[i]
        sd[p + "post_attention_layernorm.weight"] = _np(
            layers["post_attention_layernorm"]["weight"])[i]
        attn = layers["attn"]
        for n in ("q_proj", "k_proj", "v_proj"):
            sd[p + f"self_attn.{n}.weight"] = _np(attn[n]["kernel"])[i]
        sd[p + "self_attn.o_proj.weight"] = _np(
            attn["o_proj"]["kernel"])[i].T
        if "mlp" in layers:
            # absent when every layer is MoE and the dead dense stack was
            # stripped (models/moe_llama.strip_dense_mlp). gmm-serving
            # trees store M zero-padded (utils/quantize.
            # pad_dense_mlp_for_gmm) — slice back to reference shapes.
            m = cfg.intermediate_size
            for n in ("gate_proj", "up_proj", "down_proj"):
                w = _np(layers["mlp"][n]["kernel"])[i]
                w = w[:, :m] if n != "down_proj" else w[:m, :]
                sd[p + f"mlp.{n}.weight"] = w.T
    return sd


def moe_llama_to_hf(params: Mapping[str, Any], cfg: LlamaConfig,
                    moe_layer_indices: Iterable[int], num_experts: int,
                    prefix: str = "model.") -> Dict[str, np.ndarray]:
    """moe_llama tree -> merged-HF state dict with DeepSpeed MoE naming.

    MoE layers emit `mlp.deepspeed_moe.gate.wg.weight` + per-expert
    `experts.deepspeed_experts.{e}.{gate,up,down}_proj.weight` and NO dense
    mlp keys (those rows in the scan stack are zero placeholders, see
    hf_weights._dense_mlp_placeholder); non-MoE layers emit dense mlp keys
    and skip the (zero) router/expert rows. Residual-MoE trees additionally
    emit `mlp.mlp.*` and `mlp.coefficient.*` for MoE layers
    (deepspeed MoE(use_residual=True) module naming).
    """
    moe_set = set(moe_layer_indices)
    sd = llama_to_hf(params, cfg, prefix)
    moe_p = params["layers"]["moe"]
    routers = _np(moe_p["router"]["kernel"])
    ek = {n: _np(moe_p["experts"][n]["kernel"])
          for n in ("gate_proj", "up_proj", "down_proj")}
    # gmm-serving trees store M zero-padded to 1024 (utils/quantize.
    # pad_moe_experts_for_gmm) — slice back to the architecture's M so the
    # exported HF checkpoint has reference shapes
    m = cfg.intermediate_size
    if ek["gate_proj"].shape[-1] > m:
        ek["gate_proj"] = ek["gate_proj"][..., :m]
        ek["up_proj"] = ek["up_proj"][..., :m]
        ek["down_proj"] = ek["down_proj"][..., :m, :]
    res = moe_p.get("residual_mlp")
    coef = moe_p.get("coefficient")
    for i in sorted(moe_set):
        p = f"{prefix}layers.{i}.mlp."
        for n in ("gate_proj", "up_proj", "down_proj"):
            sd.pop(p + f"{n}.weight", None)  # absent on stripped trees
        sd[p + "deepspeed_moe.gate.wg.weight"] = routers[i].T
        for n in ("gate_proj", "up_proj", "down_proj"):
            for e in range(num_experts):
                sd[p + "deepspeed_moe.experts.deepspeed_experts."
                   f"{e}.{n}.weight"] = ek[n][i, e].T
        if res is not None:
            for n in ("gate_proj", "up_proj", "down_proj"):
                sd[p + f"mlp.{n}.weight"] = _np(res[n]["kernel"])[i].T
            sd[p + "coefficient.weight"] = _np(coef["kernel"])[i].T
            sd[p + "coefficient.bias"] = _np(coef["bias"])[i]
    return sd


# ---------------------------------------------------------------------------
# SAM-Med2D (inverse of hf_weights.sam_from_torch)
# ---------------------------------------------------------------------------

def sam_to_torch(params: Mapping[str, Any], cfg: SamConfig,
                 prefix: str = "") -> Dict[str, np.ndarray]:
    """SAM tree -> sam-med2d torch layout (image_encoder/prompt_encoder/
    mask_decoder key space of build_sam.py:123-148).

    Rel-pos tables are stored padded to the max length for scan uniformity
    (hf_weights.stk_rel_pos); export trims each block back to its true
    2*size-1 rows (window blocks: window_size, global blocks: the feature
    grid side).
    """
    sd: Dict[str, np.ndarray] = {}
    enc = params["image_encoder"]
    p = prefix + "image_encoder."
    # HWIO -> torch OIHW
    sd[p + "patch_embed.proj.weight"] = _np(
        enc["patch_embed"]["kernel"]).transpose(3, 2, 0, 1)
    sd[p + "patch_embed.proj.bias"] = _np(enc["patch_embed"]["bias"])
    sd[p + "pos_embed"] = _np(enc["pos_embed"])
    grid = cfg.image_embedding_size
    blocks = enc["blocks"]
    for i in range(cfg.encoder_depth):
        b = p + f"blocks.{i}."
        size = grid if i in cfg.encoder_global_attn_indexes \
            else cfg.window_size
        rel_len = 2 * size - 1
        for n in ("norm1", "norm2"):
            sd[b + n + ".weight"] = _np(blocks[n]["weight"])[i]
            sd[b + n + ".bias"] = _np(blocks[n]["bias"])[i]
        attn = blocks["attn"]
        for n in ("qkv", "proj"):
            sd[b + f"attn.{n}.weight"] = _np(attn[n]["kernel"])[i].T
            sd[b + f"attn.{n}.bias"] = _np(attn[n]["bias"])[i]
        sd[b + "attn.rel_pos_h"] = _np(attn["rel_pos_h"])[i, :rel_len]
        sd[b + "attn.rel_pos_w"] = _np(attn["rel_pos_w"])[i, :rel_len]
        for n in ("lin1", "lin2"):
            sd[b + f"mlp.{n}.weight"] = _np(blocks["mlp"][n]["kernel"])[i].T
            sd[b + f"mlp.{n}.bias"] = _np(blocks["mlp"][n]["bias"])[i]
        if cfg.use_adapter:
            ad = blocks["adapter"]
            sd[b + "Adapter.channel.0.weight"] = _np(
                ad["channel_fc1"]["kernel"])[i].T
            sd[b + "Adapter.channel.2.weight"] = _np(
                ad["channel_fc2"]["kernel"])[i].T
            sd[b + "Adapter.spatial.0.weight"] = _np(
                ad["spatial_conv"]["kernel"])[i].transpose(3, 2, 0, 1)
            # convtranspose kept in torch [Cin, Cout, kh, kw] layout
            sd[b + "Adapter.spatial.2.weight"] = _np(
                ad["spatial_convt"]["kernel"])[i]
            sd[b + "Adapter.norm.weight"] = _np(ad["norm"]["weight"])[i]
            sd[b + "Adapter.norm.bias"] = _np(ad["norm"]["bias"])[i]
    neck = enc["neck"]
    for j, (cv, ln) in enumerate((("conv1", "ln1"), ("conv2", "ln2"))):
        sd[p + f"neck.{2 * j}.weight"] = _np(
            neck[cv]["kernel"]).transpose(3, 2, 0, 1)
        sd[p + f"neck.{2 * j + 1}.weight"] = _np(neck[ln]["weight"])
        sd[p + f"neck.{2 * j + 1}.bias"] = _np(neck[ln]["bias"])

    pe = params["prompt_encoder"]
    q = prefix + "prompt_encoder."
    sd[q + "pe_layer.positional_encoding_gaussian_matrix"] = _np(
        pe["pe_layer"]["gaussian_matrix"])
    pts = _np(pe["point_embeddings"])
    for i in range(4):
        sd[q + f"point_embeddings.{i}.weight"] = pts[i][None]
    sd[q + "not_a_point_embed.weight"] = _np(pe["not_a_point_embed"])[None]
    sd[q + "no_mask_embed.weight"] = _np(pe["no_mask_embed"])[None]
    md_idx = {"conv1": 0, "ln1": 1, "conv2": 3, "ln2": 4, "conv3": 6}
    for name, j in md_idx.items():
        leaf = pe["mask_downscaling"][name]
        if name.startswith("conv"):
            sd[q + f"mask_downscaling.{j}.weight"] = _np(
                leaf["kernel"]).transpose(3, 2, 0, 1)
        else:
            sd[q + f"mask_downscaling.{j}.weight"] = _np(leaf["weight"])
        sd[q + f"mask_downscaling.{j}.bias"] = _np(leaf["bias"])

    md = params["mask_decoder"]
    r = prefix + "mask_decoder."

    def put_lin(name, leaf):
        sd[r + name + ".weight"] = _np(leaf["kernel"]).T
        if "bias" in leaf:
            sd[r + name + ".bias"] = _np(leaf["bias"])

    def put_ln(name, leaf):
        sd[r + name + ".weight"] = _np(leaf["weight"])
        sd[r + name + ".bias"] = _np(leaf["bias"])

    def put_attn(name, blk):
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put_lin(name + "." + n, blk[n])

    sd[r + "iou_token.weight"] = _np(md["iou_token"])
    sd[r + "mask_tokens.weight"] = _np(md["mask_tokens"])
    for i, layer in enumerate(md["transformer"]["layers"]):
        b = f"transformer.layers.{i}"
        put_attn(b + ".self_attn", layer["self_attn"])
        put_attn(b + ".cross_attn_token_to_image",
                 layer["cross_attn_token_to_image"])
        put_attn(b + ".cross_attn_image_to_token",
                 layer["cross_attn_image_to_token"])
        for n in ("norm1", "norm2", "norm3", "norm4"):
            put_ln(b + "." + n, layer[n])
        put_lin(b + ".mlp.lin1", layer["mlp"]["lin1"])
        put_lin(b + ".mlp.lin2", layer["mlp"]["lin2"])
    put_attn("transformer.final_attn_token_to_image",
             md["transformer"]["final_attn_token_to_image"])
    put_ln("transformer.norm_final_attn",
           md["transformer"]["norm_final_attn"])
    up = md["output_upscaling"]
    for name, j in (("convt1", 0), ("convt2", 3)):
        # convtranspose kernels kept in torch layout end-to-end
        sd[r + f"output_upscaling.{j}.weight"] = _np(up[name]["kernel"])
        sd[r + f"output_upscaling.{j}.bias"] = _np(up[name]["bias"])
    put_ln("output_upscaling.1", up["ln"])
    for m, mlp in enumerate(md["output_hypernetworks_mlps"]):
        for i, lin in enumerate(mlp):
            put_lin(f"output_hypernetworks_mlps.{m}.layers.{i}", lin)
    for i, lin in enumerate(md["iou_prediction_head"]):
        put_lin(f"iou_prediction_head.layers.{i}", lin)
    return sd


# ---------------------------------------------------------------------------
# Full merged checkpoint (inverse of export.load_reference_checkpoint)
# ---------------------------------------------------------------------------

def medplib_to_hf(params: Mapping[str, Any],
                  cfg: MedplibConfig) -> Dict[str, np.ndarray]:
    """Full medplib_tpu tree -> one merged-HF state dict: LLM under `model.`,
    `lm_head.weight` at top level, projector/text_hidden_fcs/region adapter
    under their `model.` names, and the SAM copy under `model.visual_model.*`
    — the layout the reference's merge tool writes and its builder consumes
    (merge_lora_weights_and_save_hf_model_moe.py:322-344,
    model/medplib/model/builder.py:154-188).
    """
    if cfg.moe.enable:
        sd = moe_llama_to_hf(
            params["llm"], cfg.llm,
            cfg.moe.layer_indices(cfg.llm.num_layers), cfg.moe.num_experts)
    else:
        sd = llama_to_hf(params["llm"], cfg.llm)

    if "mm_projector" in params:
        for i, lin in enumerate(params["mm_projector"]["layers"]):
            # torch nn.Sequential(Linear, GELU, Linear, ...) indices 0,2,4..
            sd[f"model.mm_projector.{2 * i}.weight"] = _np(lin["kernel"]).T
            sd[f"model.mm_projector.{2 * i}.bias"] = _np(lin["bias"])
    if "region_fea_adapter" in params:
        ra = params["region_fea_adapter"]
        sd["model.region_fea_adapter.weight"] = _np(ra["kernel"]).T
        sd["model.region_fea_adapter.bias"] = _np(ra["bias"])
    if "text_hidden_fcs" in params:
        t = params["text_hidden_fcs"]
        # Sequential(Linear, ReLU, Linear, Dropout) -> indices 0 and 2
        sd["model.text_hidden_fcs.0.0.weight"] = _np(t["fc1"]["kernel"]).T
        sd["model.text_hidden_fcs.0.0.bias"] = _np(t["fc1"]["bias"])
        sd["model.text_hidden_fcs.0.2.weight"] = _np(t["fc2"]["kernel"]).T
        sd["model.text_hidden_fcs.0.2.bias"] = _np(t["fc2"]["bias"])
    if "sam" in params:
        sd.update(sam_to_torch(params["sam"], cfg.sam,
                               prefix="model.visual_model."))
    return sd


def save_hf_dir(sd: Mapping[str, np.ndarray], out_dir: str,
                config_json: Optional[str] = None,
                shard_bytes: int = 4 * 1024 ** 3) -> None:
    """Write a state dict as an HF-style directory of safetensors shards
    (model.safetensors, or model-0000N-of-0000M.safetensors + index.json when
    larger than `shard_bytes`), plus an optional config.json."""
    import json

    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    items = [(k, np.ascontiguousarray(_np(v))) for k, v in sd.items()]
    shards, cur, cur_bytes = [], {}, 0
    for k, v in items:
        if cur and cur_bytes + v.nbytes > shard_bytes:
            shards.append(cur)
            cur, cur_bytes = {}, 0
        cur[k] = v
        cur_bytes += v.nbytes
    shards.append(cur)
    if len(shards) == 1:
        save_file(shards[0], os.path.join(out_dir, "model.safetensors"))
    else:
        index = {"metadata": {"total_size": sum(v.nbytes for _, v in items)},
                 "weight_map": {}}
        n = len(shards)
        for si, shard in enumerate(shards):
            fname = f"model-{si + 1:05d}-of-{n:05d}.safetensors"
            save_file(shard, os.path.join(out_dir, fname))
            for k in shard:
                index["weight_map"][k] = fname
        with open(os.path.join(out_dir,
                               "model.safetensors.index.json"), "w") as f:
            json.dump(index, f, indent=2)
    if config_json is not None:
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            f.write(config_json)
