"""Checkpoint export/conversion tools.

Rebuilds the reference's checkpoint toolchain (SURVEY.md §2.3 #29):
- merge_lora: fold LoRA adapters into base weights + save
  (merge_lora_weights_and_save_hf_model[_moe].py)
- convert f32: cast a params tree to float32 for export
  (params_bf16_to_f32.py semantics — here a tree cast, no DeepSpeed shards)
- inspect: print every leaf path/shape/dtype (utils/show_weight.py)
- load_reference_checkpoint: assemble a full medplib_tpu param tree from the
  released HF/torch artifacts (MedPLIB merged HF dir + sam-med2d_b.pth +
  CLIP), via utils/hf_weights translators.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import numpy as np


def merge_lora(params: Any, scale: float = 2.0) -> Any:
    from medplib_tpu.train.lora import merge
    return merge(params, scale=scale)


def cast_f32(params: Any) -> Any:
    import jax.numpy as jnp
    from medplib_tpu.utils.hf_weights import cast_tree
    return cast_tree(params, jnp.float32)


def inspect_tree(params: Any, out=print):
    import jax
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        total += n
        out(f"{name:80s} {str(getattr(leaf, 'shape', ())):20s} "
            f"{getattr(leaf, 'dtype', '?')} {n:>12,d}")
    out(f"{'TOTAL':80s} {'':20s} {'':8s} {total:>12,d}")
    return total


def load_hf_torch_dir(path: str) -> dict:
    """Read a merged HF export directory's *.bin / *.safetensors into one
    state dict (host RAM, numpy)."""
    import glob
    sd = {}
    bins = sorted(glob.glob(os.path.join(path, "*.bin")))
    if bins:
        import torch
        for f in bins:
            sd.update(torch.load(f, map_location="cpu", weights_only=True))
        return sd
    sts = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if sts:
        from safetensors import safe_open
        for f in sts:
            with safe_open(f, framework="np") as h:
                for k in h.keys():
                    sd[k] = h.get_tensor(k)
        return sd
    raise FileNotFoundError(f"no *.bin or *.safetensors under {path}")


def load_reference_checkpoint(
    hf_dir: str,
    sam_path: Optional[str] = None,
    clip_dir: Optional[str] = None,
    moe: bool = True,
    num_experts: int = 2,
    cfg=None,
    state_dict: Optional[dict] = None,
):
    """Released-checkpoint loader: MedPLIB merged HF dir (LLM + projector +
    text_hidden_fcs + region adapter + SAM copy) -> medplib_tpu tree.

    The merged export stores everything under `model.` prefixes
    (builder.py:154-188); SAM weights may also be reloaded from
    --vision_pretrained (build_sam.py:123-148) when `sam_path` is given.
    """
    from medplib_tpu.config import MedplibConfig, MoeConfig
    from medplib_tpu.utils import hf_weights as hw

    sd = load_hf_torch_dir(hf_dir) if state_dict is None else state_dict
    if cfg is None:
        cfg = MedplibConfig(
            moe=MoeConfig(enable=moe, num_experts=num_experts, top_k=1,
                          capacity_factor=1.5, eval_capacity_factor=2.0,
                          moe_mode="dense"))
    else:
        moe, num_experts = cfg.moe.enable, cfg.moe.num_experts

    if moe:
        llm = hw.moe_llama_from_hf(
            sd, cfg.llm, cfg.moe.layer_indices(cfg.llm.num_layers),
            num_experts)
    else:
        llm = hw.llama_from_hf(sd, cfg.llm)

    params = {"llm": llm}

    # projector: model.mm_projector.{0,2}.{weight,bias}
    proj_layers = []
    for i in (0, 2):
        k = f"model.mm_projector.{i}.weight"
        if k in sd:
            proj_layers.append({
                "kernel": hw.to_np(sd[k]).T,
                "bias": hw.to_np(sd[f"model.mm_projector.{i}.bias"])})
    params["mm_projector"] = {"layers": proj_layers}

    if "model.region_fea_adapter.weight" in sd:
        params["region_fea_adapter"] = {
            "kernel": hw.to_np(sd["model.region_fea_adapter.weight"]).T,
            "bias": hw.to_np(sd["model.region_fea_adapter.bias"])}

    # text_hidden_fcs: model.text_hidden_fcs.0.{0,2}.{weight,bias}
    if "model.text_hidden_fcs.0.0.weight" in sd:
        params["text_hidden_fcs"] = {
            "fc1": {"kernel": hw.to_np(
                sd["model.text_hidden_fcs.0.0.weight"]).T,
                "bias": hw.to_np(sd["model.text_hidden_fcs.0.0.bias"])},
            "fc2": {"kernel": hw.to_np(
                sd["model.text_hidden_fcs.0.2.weight"]).T,
                "bias": hw.to_np(sd["model.text_hidden_fcs.0.2.bias"])},
        }

    # SAM: prefer the standalone sam-med2d checkpoint; else the copy under
    # model.visual_model.*
    if sam_path is not None:
        import torch
        sam_sd = torch.load(sam_path, map_location="cpu", weights_only=True)
        params["sam"] = hw.sam_from_torch(sam_sd, cfg.sam)
    else:
        vis = {k[len("model.visual_model."):]: v for k, v in sd.items()
               if k.startswith("model.visual_model.")}
        if vis:
            params["sam"] = hw.sam_from_torch(vis, cfg.sam)

    if clip_dir is not None:
        clip_sd = load_hf_torch_dir(clip_dir)
        params["clip"] = hw.clip_vision_from_hf(clip_sd, cfg.vision)

    return cfg, params


def make_delta(base: Any, target: Any) -> Any:
    """target - base per shared leaf; target-only leaves (e.g. the projector)
    pass through verbatim (model/medplib/model/make_delta.py semantics)."""
    import jax

    def rec(t, b):
        if isinstance(t, dict):
            return {k: (rec(v, b[k]) if isinstance(b, dict) and k in b else v)
                    for k, v in t.items()}
        if b is None or not hasattr(t, "shape"):
            return t
        if getattr(b, "shape", None) != t.shape:
            return t  # resized vocab rows etc. pass through
        d = np.asarray(t, np.float32) - np.asarray(b, np.float32)
        return d.astype(np.asarray(t).dtype)  # keep the checkpoint dtype

    return rec(target, base)


def apply_delta(base: Any, delta: Any) -> Any:
    """base + delta; delta-only leaves pass through
    (model/medplib/model/apply_delta.py semantics, incl. the projector
    allowlist behavior generalized to any new leaf)."""
    def rec(d, b):
        if isinstance(d, dict):
            return {k: (rec(v, b[k]) if isinstance(b, dict) and k in b else v)
                    for k, v in d.items()}
        if b is None or not hasattr(d, "shape") or \
                getattr(b, "shape", None) != getattr(d, "shape", None):
            return d
        out = np.asarray(b, np.float32) + np.asarray(d, np.float32)
        return out.astype(np.asarray(d).dtype)

    return rec(delta, base)


def consolidate(src_path: str, dst_path: str) -> None:
    """Round-trip a checkpoint through load+save so sharded/partial state
    becomes one consolidated artifact (model/medplib/model/consolidate.py)."""
    from medplib_tpu.utils.checkpoint import load_params, save_params
    save_params(dst_path, load_params(src_path))


def export_seg_decoder(params: Any, cfg, batch_size: int = 1,
                       num_segs: int = 1,
                       platforms=("tpu", "cpu")) -> bytes:
    """Serialize the SEG->mask decode head as portable StableHLO.

    TPU-native counterpart of the reference's SAM ONNX export
    (model/segment_anything_med2d/utils/onnx.py SamOnnxModel): a
    standalone deployable artifact that takes (sam image embeddings,
    projected SEG text embeddings) and returns (mask logits, iou). Use
    `jax.export.deserialize(blob).call(...)` to run it anywhere XLA runs.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from medplib_tpu.models import medplib

    e = cfg.sam.image_embedding_size
    d = cfg.sam.prompt_embed_dim

    def decode(sam_params, text_params, sam_emb, hidden):
        seg = medplib.text_hidden_fcs(text_params, hidden)
        full = {"sam": sam_params, "text_hidden_fcs": text_params}
        return medplib.decode_seg_masks(full, cfg, sam_emb, seg,
                                        cfg.sam.image_size)

    sub = {k: params[k] for k in ("sam", "text_hidden_fcs")}
    sam_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), sub["sam"])
    txt_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        sub["text_hidden_fcs"])
    ldtype = sub["text_hidden_fcs"]["fc1"]["kernel"].dtype
    emb_spec = jax.ShapeDtypeStruct((batch_size, e, e, d), ldtype)
    hid_spec = jax.ShapeDtypeStruct(
        (batch_size, num_segs, cfg.llm.hidden_size), ldtype)
    exported = jexport.export(jax.jit(decode), platforms=list(platforms))(
        sam_spec, txt_spec, emb_spec, hid_spec)
    return bytes(exported.serialize())


def main():
    import argparse
    ap = argparse.ArgumentParser(description="checkpoint tools")
    sub = ap.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("merge-lora")
    m.add_argument("--in-path", required=True)
    m.add_argument("--out-path", required=True)
    c = sub.add_parser("to-f32")
    c.add_argument("--in-path", required=True)
    c.add_argument("--out-path", required=True)
    i = sub.add_parser("inspect")
    i.add_argument("--in-path", required=True)
    t = sub.add_parser("from-reference")
    t.add_argument("--hf-dir", required=True)
    t.add_argument("--sam-path")
    t.add_argument("--clip-dir")
    t.add_argument("--dense", action="store_true")
    t.add_argument("--config", default=None,
                   help="medplib_tpu config json steering the translation "
                        "(dims/MoE layout); default is the flagship "
                        "MedPLIB-7b-2e config")
    t.add_argument("--out-path", required=True)
    h = sub.add_parser(
        "to-hf", help="re-export a tree as a merged HF safetensors dir "
        "(inverse of from-reference; reference merge-tool layout)")
    h.add_argument("--in-path", required=True)
    h.add_argument("--config", required=True,
                   help="config json (written by from-reference / train)")
    h.add_argument("--out-dir", required=True)
    args = ap.parse_args()

    from medplib_tpu.utils.checkpoint import load_params, save_params
    if args.cmd == "merge-lora":
        save_params(args.out_path, merge_lora(load_params(args.in_path)))
    elif args.cmd == "to-f32":
        save_params(args.out_path, cast_f32(load_params(args.in_path)))
    elif args.cmd == "inspect":
        inspect_tree(load_params(args.in_path))
    elif args.cmd == "from-reference":
        user_cfg = None
        if args.config:
            from medplib_tpu.config import from_json
            with open(args.config) as f:
                user_cfg = from_json(f.read())
        cfg, params = load_reference_checkpoint(
            args.hf_dir, args.sam_path, args.clip_dir, moe=not args.dense,
            cfg=user_cfg)
        save_params(args.out_path, params)
        from medplib_tpu.config import to_json
        with open(args.out_path + ".config.json", "w") as f:
            f.write(to_json(cfg))
    elif args.cmd == "to-hf":
        from medplib_tpu.config import from_json
        from medplib_tpu.utils.hf_export import medplib_to_hf, save_hf_dir
        with open(args.config) as f:
            cfg = from_json(f.read())
        sd = medplib_to_hf(load_params(args.in_path), cfg)
        with open(args.config) as f:
            save_hf_dir(sd, args.out_dir, config_json=f.read())


if __name__ == "__main__":
    main()
