"""Typed configuration system.

Replaces the reference's giant per-entrypoint argparse parsers
(/root/reference/train_ds_medplib.py:30-139, model/eval/vqa_infer.py:34-119)
with composable dataclasses. Every knob of the reference surface has a typed
home here; entrypoints build these from CLI flags or JSON and pass them down
— configs are static (hashable) so they can be closed over by jit.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

# ---------------------------------------------------------------------------
# Special tokens (reference: utils/utils.py:7-16, train_ds_medplib.py:207-216)
# ---------------------------------------------------------------------------

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200
REGION_TOKEN_INDEX = -300

DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"

# Tokens appended to the tokenizer vocabulary by the reference trainer, in
# order (train_ds_medplib.py:207-216): <SEG>, <ref>, </ref>, <region>,
# </region>, <sr>, </sr>, <mask>, </mask>, then generation tokens
# <gen_1>..<gen_256> (1-based, range(1, 257) in the reference).
EXTRA_TOKENS = (
    "<SEG>", "<ref>", "</ref>", "<region>", "</region>",
    "<sr>", "</sr>", "<mask>", "</mask>",
) + tuple(f"<gen_{i}>" for i in range(1, 257))


def _frozen_tuple(x):
    if x is None:
        return None
    return tuple(x)


@dataclass(frozen=True)
class LlamaConfig:
    """LLaMA decoder config (llava-v1.5-7b / vicuna-7b-v1.5 defaults)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False

    @staticmethod
    def tiny(vocab_size: int = 512) -> "LlamaConfig":
        """Small config for tests."""
        return LlamaConfig(
            vocab_size=vocab_size, hidden_size=128, intermediate_size=256,
            num_layers=2, num_heads=4, num_kv_heads=4, head_dim=32,
            max_position_embeddings=512,
        )


@dataclass(frozen=True)
class MoeConfig:
    """MoE knobs mirroring the deepspeed.moe surface the reference uses
    (medplib_moe_llama.py:48-80, 602-614; train_ds_medplib.py:123-138)."""

    enable: bool = False
    num_experts: int = 2
    top_k: int = 1
    capacity_factor: float = 1.5
    eval_capacity_factor: float = 2.0
    min_capacity: int = 0
    use_residual: bool = False
    router_aux_loss_coef: float = 0.01
    # moe_mode in {dense, sparse, first_half, second_half, custom}
    # (medplib_moe_llama.py:576-600); "dense" = every layer is MoE.
    moe_mode: str = "dense"
    moe_layers_idx: Optional[Tuple[int, ...]] = None
    # NOTE: the reference's --ep_size (deepspeed expert-parallel degree,
    # train_ds_medplib.py) has its home in MeshConfig.expert here — the
    # mesh axis IS the EP degree, so the knob is not duplicated.

    def layer_indices(self, num_layers: int) -> Tuple[int, ...]:
        """Which decoder layers get an MoE MLP (medplib_moe_llama.py:576-600)."""
        if not self.enable:
            return ()
        if self.moe_layers_idx is not None:
            return tuple(self.moe_layers_idx)
        mode = self.moe_mode
        if mode == "dense":
            return tuple(range(num_layers))
        if mode == "first_half":
            return tuple(range(0, num_layers // 2))
        if mode == "second_half":
            return tuple(range(num_layers // 2, num_layers))
        if mode == "sparse":
            return tuple(range(0, num_layers, 2))
        raise ValueError(f"unknown moe_mode {mode!r}")


@dataclass(frozen=True)
class ClipVisionConfig:
    """CLIP ViT-L/14-336 vision tower (openai/clip-vit-large-patch14-336)."""

    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-5
    # Reference selects hidden layer -2 and drops CLS (clip_encoder.py:41-60).
    select_layer: int = -2
    select_feature: str = "patch"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def tiny() -> "ClipVisionConfig":
        return ClipVisionConfig(
            image_size=56, patch_size=14, hidden_size=64,
            intermediate_size=128, num_layers=3, num_heads=4,
        )


@dataclass(frozen=True)
class SamConfig:
    """SAM-Med2D ViT-B @256 (build_sam.py:51-61, 72-150)."""

    image_size: int = 256
    patch_size: int = 16
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    window_size: int = 14
    use_rel_pos: bool = True
    use_adapter: bool = True
    adapter_ratio: float = 0.25
    mlp_ratio: float = 4.0
    prompt_embed_dim: int = 256
    mask_in_chans: int = 16
    # mask decoder
    num_multimask_outputs: int = 3
    decoder_depth: int = 2
    decoder_mlp_dim: int = 2048
    decoder_num_heads: int = 8
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    layer_norm_eps: float = 1e-6
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)

    @property
    def image_embedding_size(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def tiny() -> "SamConfig":
        return SamConfig(
            image_size=64, patch_size=16, encoder_embed_dim=64,
            encoder_depth=2, encoder_num_heads=2,
            encoder_global_attn_indexes=(1,), window_size=2,
            prompt_embed_dim=32, mask_in_chans=4, decoder_mlp_dim=64,
            decoder_num_heads=2, iou_head_hidden_dim=32,
        )


@dataclass(frozen=True)
class ProjectorConfig:
    """Multimodal projector + ICL extensions (medplib_arch.py:67-143,
    multimodal_projector/builder.py:33-51)."""

    projector_type: str = "mlp2x_gelu"  # "linear" | "mlpNx_gelu"
    mm_hidden_size: int = 1024          # CLIP feature dim
    hidden_size: int = 4096             # LLM dim
    # ICL token compression 576 -> 256 (medplib_arch.py:67-77)
    token_compress: bool = False
    compress_tokens: int = 256
    # 64-token mask encoder (medplib_arch.py:80-108)
    mask_encoder: bool = False
    mask_encoder_tokens: int = 64
    mask_input_size: int = 336
    # region feature adapter (medplib_arch.py:131, 580-613)
    region_adapter: bool = False
    region_geo_sampler: bool = False
    sampler_pooler_mode: str = "max"


@dataclass(frozen=True)
class SegConfig:
    """<SEG> pixel-grounding head wiring (MedPLIB.py:127-164)."""

    enable: bool = True
    # text_hidden_fcs: hidden -> out_dim (=prompt_embed_dim)
    out_dim: int = 256
    train_mask_decoder: bool = True
    # loss weights (train_ds_medplib.py defaults; MedPLIB.py:515-572)
    ce_loss_weight: float = 1.0
    bce_loss_weight: float = 2.0
    dice_loss_weight: float = 0.5
    focal_loss_weight: float = 0.0
    iou_loss_weight: float = 0.0


@dataclass(frozen=True)
class MedplibConfig:
    """Composite model config: CLIP tower -> projector -> (MoE-)LLaMA -> SAM."""

    llm: LlamaConfig = field(default_factory=LlamaConfig)
    vision: ClipVisionConfig = field(default_factory=ClipVisionConfig)
    sam: SamConfig = field(default_factory=SamConfig)
    projector: ProjectorConfig = field(default_factory=ProjectorConfig)
    moe: MoeConfig = field(default_factory=MoeConfig)
    seg: SegConfig = field(default_factory=SegConfig)
    # token ids resolved after tokenizer surgery (train_ds_medplib.py:207-216)
    seg_token_idx: int = 32000
    vocab_size_padded: int = 32320   # 32000 + 9 special + 256 gen + pad to 64
    # ICL
    icl_enable: bool = False
    max_icl_examples: int = 3

    @staticmethod
    def tiny(**overrides) -> "MedplibConfig":
        llm = LlamaConfig.tiny()
        base = dict(
            llm=llm,
            vision=ClipVisionConfig.tiny(),
            sam=SamConfig.tiny(),
            projector=ProjectorConfig(
                projector_type="mlp2x_gelu", mm_hidden_size=64,
                hidden_size=llm.hidden_size, region_adapter=True),
            moe=MoeConfig(),
            seg=SegConfig(out_dim=32),
            seg_token_idx=500,
            vocab_size_padded=512,
        )
        base.update(overrides)
        return MedplibConfig(**base)


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes. data = DP (ZeRO-like state sharding rides this axis),
    expert = EP for MoE dispatch, model = TP (optional at 7B)."""

    data: int = 1
    expert: int = 1
    model: int = 1

    @property
    def total(self) -> int:
        return self.data * self.expert * self.model


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (train_ds_medplib.py:30-139, scripts/*.sh)."""

    lr: float = 3e-4
    beta1: float = 0.9
    beta2: float = 0.95
    weight_decay: float = 0.0
    grad_clip_norm: float = 1.0
    warmup_steps: int = 100
    total_steps: int = 10000
    min_lr_ratio: float = 0.0
    batch_size: int = 4
    grad_accumulation_steps: int = 1
    epochs: int = 1
    steps_per_epoch: int = 500
    precision: str = "bf16"
    seed: int = 42
    # LoRA (train_ds_medplib.py:262-303)
    lora_enable: bool = True
    lora_r: int = 8
    lora_alpha: int = 16
    lora_dropout: float = 0.05
    lora_target_modules: Tuple[str, ...] = ("q_proj", "v_proj")
    # modules whose full weights stay trainable alongside LoRA
    # (train_ds_medplib.py:316-326 sft_modules)
    sft_modules: Tuple[str, ...] = (
        "text_hidden_fcs", "mask_decoder", "lm_head", "embed_tokens",
        "region_fea_adapter",
    )
    save_steps: int = 500
    log_steps: int = 10
    # sequence budget (model_max_length)
    max_seq_len: int = 1024


# ---------------------------------------------------------------------------
# JSON round-trip (configs are persisted next to checkpoints so exported
# models are self-describing, like the reference's config.moe persistence at
# MedPLIB.py:211-227)
# ---------------------------------------------------------------------------

_CONFIG_TYPES = {
    c.__name__: c
    for c in (LlamaConfig, MoeConfig, ClipVisionConfig, SamConfig,
              ProjectorConfig, SegConfig, MedplibConfig, MeshConfig,
              TrainConfig)
}


def to_json(cfg: Any) -> str:
    def enc(o):
        if dataclasses.is_dataclass(o):
            d = {f.name: enc(getattr(o, f.name)) for f in dataclasses.fields(o)}
            d["__type__"] = type(o).__name__
            return d
        if isinstance(o, (list, tuple)):
            return [enc(v) for v in o]
        return o
    return json.dumps(enc(cfg), indent=2)


def from_json(s: str) -> Any:
    def dec(o):
        if isinstance(o, dict) and "__type__" in o:
            cls = _CONFIG_TYPES[o.pop("__type__")]
            # drop unknown keys so checkpoints persisted with an older
            # schema (e.g. the removed MoeConfig.ep_size) still load
            known = {f.name for f in dataclasses.fields(cls)}
            kwargs = {k: dec(v) for k, v in o.items() if k in known}
            for f in dataclasses.fields(cls):
                if f.name in kwargs and isinstance(kwargs[f.name], list):
                    kwargs[f.name] = tuple(kwargs[f.name])
            return cls(**kwargs)
        if isinstance(o, list):
            return [dec(v) for v in o]
        return o
    return dec(json.loads(s))


def with_icl(cfg: "MedplibConfig", *, token_compress: bool = False,
             compress_tokens: Optional[int] = None,
             mask_encoder: bool = False,
             mask_encoder_tokens: Optional[int] = None,
             max_icl_examples: int = 3) -> "MedplibConfig":
    """Apply the ICL CLI flags to a model config — shared by the train and
    eval drivers (reference --icl_enable/--mm_token_compress/
    --mm_compressed_token_count/--icl_mask_encoder/--mask_encoder_token_count,
    train_ds_medplib.py:67-72). Tiny configs get proportionally tiny ICL
    dims so the --tiny smoke path exercises the same code."""
    import dataclasses as _dc
    tiny = cfg.vision.image_size < 100
    if compress_tokens is None:
        compress_tokens = (max(cfg.vision.num_patches // 2, 1) if tiny
                           else cfg.projector.compress_tokens)
    if mask_encoder_tokens is None:
        mask_encoder_tokens = 4 if tiny else cfg.projector.mask_encoder_tokens
    proj = _dc.replace(
        cfg.projector,
        token_compress=bool(token_compress),
        compress_tokens=compress_tokens,
        mask_encoder=bool(mask_encoder),
        mask_encoder_tokens=mask_encoder_tokens,
        mask_input_size=(cfg.vision.image_size if tiny
                         else cfg.projector.mask_input_size))
    return _dc.replace(cfg, projector=proj, icl_enable=True,
                       max_icl_examples=max_icl_examples)


def tiny_cli_config(moe_cfg: "MoeConfig", seg_token_idx: int,
                    tokenizer_len: int, seg_cfg: "SegConfig" = None,
                    region_adapter: bool = None,
                    region_geo_sampler: bool = None) -> "MedplibConfig":
    """Shared --tiny debug config builder for the train/eval/chat CLIs:
    tiny dimensions, the caller's MoE/loss settings, tokenizer-derived ids,
    and (unlike a bare MedplibConfig.tiny()) the CLI's region flags."""
    import dataclasses as _dc
    cfg = MedplibConfig.tiny()
    proj = cfg.projector
    if region_adapter is not None:
        proj = _dc.replace(proj, region_adapter=bool(region_adapter))
    if region_geo_sampler is not None:
        proj = _dc.replace(proj, region_geo_sampler=bool(region_geo_sampler))
    seg = cfg.seg
    if seg_cfg is not None:  # user loss weights, tiny out_dim
        seg = _dc.replace(seg_cfg, out_dim=cfg.seg.out_dim)
    return _dc.replace(cfg, moe=moe_cfg, seg=seg, projector=proj,
                       seg_token_idx=seg_token_idx,
                       vocab_size_padded=max(tokenizer_len + 8, 64))
