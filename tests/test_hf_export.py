"""HF re-export (utils/hf_export.py): exact inverse of utils/hf_weights.py.

Round-trip tests double as schema verification of the released-checkpoint
loader: the exported key space IS the merged-checkpoint manifest the
reference's merge tool writes (merge_lora_weights_and_save_hf_model_moe.py
:322-344) and its builder consumes (model/medplib/model/builder.py:154-188),
and the SAM key manifest is checked against the reference torch modules
directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import (LlamaConfig, MedplibConfig, MoeConfig,
                                SamConfig)
from medplib_tpu.utils import hf_export, hf_weights


def _dense_llama_sd(cfg, rng):
    h, m = cfg.hidden_size, cfg.intermediate_size
    sd = {
        "model.embed_tokens.weight": rng.normal(
            size=(cfg.vocab_size, h)).astype(np.float32),
        "model.norm.weight": rng.normal(size=(h,)).astype(np.float32),
        "lm_head.weight": rng.normal(
            size=(cfg.vocab_size, h)).astype(np.float32),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = rng.normal(size=(h,)).astype(
            np.float32)
        sd[p + "post_attention_layernorm.weight"] = rng.normal(
            size=(h,)).astype(np.float32)
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[p + f"self_attn.{n}.weight"] = rng.normal(
                size=(h, h)).astype(np.float32)
        for n, shape in (("gate_proj", (m, h)), ("up_proj", (m, h)),
                         ("down_proj", (h, m))):
            sd[p + f"mlp.{n}.weight"] = rng.normal(size=shape).astype(
                np.float32)
    return sd


def _moe_llama_sd(cfg, rng, num_experts=2, residual=True):
    """MoE merged-export layout: all layers MoE (moe_mode=dense), dense mlp
    keys replaced by deepspeed_moe keys (+ residual copy when present)."""
    sd = _dense_llama_sd(cfg, rng)
    h, m = cfg.hidden_size, cfg.intermediate_size
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}.mlp."
        for n in ("gate_proj", "up_proj", "down_proj"):
            del sd[p + f"{n}.weight"]
        sd[p + "deepspeed_moe.gate.wg.weight"] = rng.normal(
            size=(num_experts, h)).astype(np.float32)
        for e in range(num_experts):
            for n, shape in (("gate_proj", (m, h)), ("up_proj", (m, h)),
                             ("down_proj", (h, m))):
                sd[p + "deepspeed_moe.experts.deepspeed_experts."
                   f"{e}.{n}.weight"] = rng.normal(size=shape).astype(
                       np.float32)
        if residual:
            for n, shape in (("gate_proj", (m, h)), ("up_proj", (m, h)),
                             ("down_proj", (h, m))):
                sd[p + f"mlp.{n}.weight"] = rng.normal(size=shape).astype(
                    np.float32)
            sd[p + "coefficient.weight"] = rng.normal(size=(2, h)).astype(
                np.float32)
            sd[p + "coefficient.bias"] = rng.normal(size=(2,)).astype(
                np.float32)
    return sd


def _assert_sd_equal(a, b):
    assert set(a) == set(b), (
        f"only in a: {sorted(set(a) - set(b))[:5]}; "
        f"only in b: {sorted(set(b) - set(a))[:5]}")
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_llama_hf_roundtrip():
    cfg = LlamaConfig.tiny()
    sd = _dense_llama_sd(cfg, np.random.default_rng(0))
    tree = hf_weights.llama_from_hf(sd, cfg)
    _assert_sd_equal(hf_export.llama_to_hf(tree, cfg), sd)


def test_llama_hf_roundtrip_gmm_padded_mlp():
    """A gmm-serving tree with the dense FFN zero-padded (utils/quantize.
    pad_dense_mlp_for_gmm) exports with REFERENCE shapes: llama_to_hf
    slices M back to cfg.intermediate_size."""
    from medplib_tpu.utils.quantize import pad_dense_mlp_for_gmm
    cfg = LlamaConfig.tiny()
    sd = _dense_llama_sd(cfg, np.random.default_rng(2))
    tree = hf_weights.llama_from_hf(sd, cfg)
    tree["layers"]["mlp"] = pad_dense_mlp_for_gmm(
        tree["layers"]["mlp"], align=cfg.intermediate_size + 8)
    assert tree["layers"]["mlp"]["gate_proj"]["kernel"].shape[-1] \
        == cfg.intermediate_size + 8
    _assert_sd_equal(hf_export.llama_to_hf(tree, cfg), sd)


def test_moe_residual_hf_roundtrip():
    cfg = LlamaConfig.tiny()
    sd = _moe_llama_sd(cfg, np.random.default_rng(1))
    idx = range(cfg.num_layers)
    tree = hf_weights.moe_llama_from_hf(sd, cfg, idx, num_experts=2)
    _assert_sd_equal(
        hf_export.moe_llama_to_hf(tree, cfg, idx, num_experts=2), sd)


def test_moe_no_residual_roundtrip_skips_zero_rows():
    """Non-residual MoE: exporter emits neither dense-mlp placeholders nor
    residual keys for MoE layers."""
    cfg = LlamaConfig.tiny()
    sd = _moe_llama_sd(cfg, np.random.default_rng(2), residual=False)
    idx = range(cfg.num_layers)
    tree = hf_weights.moe_llama_from_hf(sd, cfg, idx, num_experts=2)
    _assert_sd_equal(
        hf_export.moe_llama_to_hf(tree, cfg, idx, num_experts=2), sd)


def test_sam_sd_roundtrip():
    """tree -> torch sd -> tree -> torch sd is identity (incl. rel-pos pad
    trimming, adapter layouts, convtranspose torch layout)."""
    from medplib_tpu.models.sam_med2d import init_sam
    cfg = SamConfig.tiny()
    tree = init_sam(jax.random.PRNGKey(0), cfg)
    # randomize every leaf so layout mistakes can't hide in zeros
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    rng = np.random.default_rng(3)
    tree = jax.tree_util.tree_unflatten(
        treedef, [rng.normal(size=np.shape(x)).astype(np.float32)
                  for x in leaves])
    sd = hf_export.sam_to_torch(tree, cfg)
    tree2 = hf_weights.sam_from_torch(sd, cfg)
    _assert_sd_equal(hf_export.sam_to_torch(tree2, cfg), sd)


def test_sam_manifest_vs_reference_modules():
    """Exported SAM key space == the reference torch modules' state_dict
    (keys AND shapes), so load_reference_checkpoint's assumptions are
    schema-verified against the real builder (build_sam.py:72-150)."""
    torch = pytest.importorskip("torch")
    from reference_oracle import load_ref_module
    import functools
    from medplib_tpu.models.sam_med2d import init_sam

    ie = load_ref_module("segment_anything_med2d.modeling.image_encoder")
    pe = load_ref_module("segment_anything_med2d.modeling.prompt_encoder")
    md = load_ref_module("segment_anything_med2d.modeling.mask_decoder")
    tr = load_ref_module("segment_anything_med2d.modeling.transformer")
    cfg = SamConfig(
        image_size=96, patch_size=16, encoder_embed_dim=64, encoder_depth=2,
        encoder_num_heads=2, encoder_global_attn_indexes=(1,), window_size=3,
        prompt_embed_dim=32, mask_in_chans=8, decoder_mlp_dim=64,
        decoder_num_heads=2, iou_head_hidden_dim=16)
    image_encoder = ie.ImageEncoderViT(
        img_size=cfg.image_size, patch_size=cfg.patch_size,
        embed_dim=cfg.encoder_embed_dim, depth=cfg.encoder_depth,
        num_heads=cfg.encoder_num_heads, mlp_ratio=cfg.mlp_ratio,
        out_chans=cfg.prompt_embed_dim, qkv_bias=True,
        norm_layer=functools.partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=True,
        global_attn_indexes=cfg.encoder_global_attn_indexes,
        window_size=cfg.window_size, adapter_train=True)
    prompt_encoder = pe.PromptEncoder(
        embed_dim=cfg.prompt_embed_dim,
        image_embedding_size=(cfg.image_embedding_size,) * 2,
        input_image_size=(cfg.image_size,) * 2,
        mask_in_chans=cfg.mask_in_chans)
    mask_decoder = md.MaskDecoder(
        num_multimask_outputs=cfg.num_multimask_outputs,
        transformer=tr.TwoWayTransformer(
            depth=cfg.decoder_depth, embedding_dim=cfg.prompt_embed_dim,
            mlp_dim=cfg.decoder_mlp_dim, num_heads=cfg.decoder_num_heads),
        transformer_dim=cfg.prompt_embed_dim,
        iou_head_depth=cfg.iou_head_depth,
        iou_head_hidden_dim=cfg.iou_head_hidden_dim)
    ref = {}
    for prefix, mod in (("image_encoder.", image_encoder),
                        ("prompt_encoder.", prompt_encoder),
                        ("mask_decoder.", mask_decoder)):
        for k, v in mod.state_dict().items():
            ref[prefix + k] = tuple(v.shape)

    ours = {k: np.shape(v) for k, v in hf_export.sam_to_torch(
        init_sam(jax.random.PRNGKey(0), cfg), cfg).items()}
    assert set(ours) == set(ref), (
        f"only ours: {sorted(set(ours) - set(ref))[:8]}; "
        f"only ref: {sorted(set(ref) - set(ours))[:8]}")
    for k in ref:
        assert tuple(ours[k]) == ref[k], f"{k}: {ours[k]} vs {ref[k]}"


def test_full_checkpoint_roundtrip_through_loader():
    """init tree -> medplib_to_hf -> load_reference_checkpoint -> to_hf is
    identity over the whole merged key space (LLM incl. residual-MoE,
    projector, region adapter, text_hidden_fcs, model.visual_model.*) —
    proving the loader consumes exactly the keys the reference layout
    carries."""
    from medplib_tpu.models.medplib import init_medplib
    from medplib_tpu.utils.export import load_reference_checkpoint

    cfg = MedplibConfig.tiny(moe=MoeConfig(
        enable=True, num_experts=2, top_k=1, use_residual=True,
        moe_mode="dense"))
    tree = init_medplib(jax.random.PRNGKey(0), cfg)
    sd = hf_export.medplib_to_hf(tree, cfg)
    _, loaded = load_reference_checkpoint(
        hf_dir="<inline>", cfg=cfg, state_dict=sd)
    _assert_sd_equal(hf_export.medplib_to_hf(loaded, cfg), sd)


def test_save_hf_dir_roundtrip(tmp_path):
    """save_hf_dir shards + index are readable back via load_hf_torch_dir,
    preserving bf16."""
    from medplib_tpu.utils.export import load_hf_torch_dir

    sd = {"a.weight": np.arange(6, dtype=np.float32).reshape(2, 3),
          "b.weight": jnp.ones((4, 4), jnp.bfloat16)}
    out = str(tmp_path / "hf")
    hf_export.save_hf_dir(sd, out, config_json="{}", shard_bytes=32)
    back = load_hf_torch_dir(out)
    assert set(back) == set(sd)
    np.testing.assert_array_equal(back["a.weight"], sd["a.weight"])
    assert back["b.weight"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(back["b.weight"], np.float32),
                                  np.ones((4, 4), np.float32))


def test_quantized_flagship_exports_same_manifest():
    """Task-10 extension: the QUANTIZED flagship tree (int8 attn + int4h
    experts, utils/quantize.quantize_flagship_moe) dequantizes back to the
    exact HF key manifest of the unquantized export, values within
    quantization tolerance."""
    import dataclasses

    from medplib_tpu.models import medplib
    from medplib_tpu.utils import quantize as qz

    cfg = dataclasses.replace(MedplibConfig.tiny(), moe=MoeConfig(
        enable=True, num_experts=2, top_k=1, moe_mode="dense"))
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    sd_ref = hf_export.medplib_to_hf(params, cfg)

    qparams = qz.quantize_flagship_moe(
        jax.tree_util.tree_map(lambda a: a, params))
    qparams = qz.dequantize_tree(qparams, jnp.float32)
    sd_q = hf_export.medplib_to_hf(qparams, cfg)

    assert set(sd_q) == set(sd_ref)
    for k in sd_ref:
        a, b = sd_ref[k], sd_q[k]
        assert a.shape == b.shape, k
        denom = np.abs(a).mean() + 1e-6
        # int4h experts on tiny random weights: ~10% mean error; int8 ~1%
        assert np.abs(a - b).mean() / denom < 0.2, k
