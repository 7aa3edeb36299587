"""SAM-Med2D parity vs the reference torch implementation (used read-only as
an oracle: random torch weights -> state-dict translation -> output compare)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import SamConfig
from medplib_tpu.models import sam_med2d
from medplib_tpu.utils.hf_weights import sam_from_torch

torch = pytest.importorskip("torch")

from reference_oracle import load_ref_module  # noqa: E402


@pytest.fixture(scope="module")
def oracle():
    ie = load_ref_module("segment_anything_med2d.modeling.image_encoder")
    pe = load_ref_module("segment_anything_med2d.modeling.prompt_encoder")
    md = load_ref_module("segment_anything_med2d.modeling.mask_decoder")
    tr = load_ref_module("segment_anything_med2d.modeling.transformer")
    return ie, pe, md, tr


@pytest.fixture(scope="module")
def torch_sam(oracle):
    """Small SAM-Med2D: 96px, 2 blocks (1 windowed w=3, 1 global), adapters."""
    ie, pe, md, tr = oracle
    import functools
    cfg = SamConfig(
        image_size=96, patch_size=16, encoder_embed_dim=64, encoder_depth=2,
        encoder_num_heads=2, encoder_global_attn_indexes=(1,), window_size=3,
        prompt_embed_dim=32, mask_in_chans=8, decoder_mlp_dim=64,
        decoder_num_heads=2, iou_head_hidden_dim=16)
    torch.manual_seed(0)
    image_encoder = ie.ImageEncoderViT(
        img_size=cfg.image_size, patch_size=cfg.patch_size,
        embed_dim=cfg.encoder_embed_dim, depth=cfg.encoder_depth,
        num_heads=cfg.encoder_num_heads, mlp_ratio=cfg.mlp_ratio,
        out_chans=cfg.prompt_embed_dim, qkv_bias=True,
        norm_layer=functools.partial(torch.nn.LayerNorm, eps=1e-6),
        use_rel_pos=True,
        global_attn_indexes=cfg.encoder_global_attn_indexes,
        window_size=cfg.window_size, adapter_train=True).eval()
    # make rel-pos / pos-embed nonzero so parity is meaningful
    with torch.no_grad():
        for name, p in image_encoder.named_parameters():
            if "rel_pos" in name or "pos_embed" in name:
                p.copy_(torch.randn_like(p) * 0.1)
    prompt_encoder = pe.PromptEncoder(
        embed_dim=cfg.prompt_embed_dim,
        image_embedding_size=(cfg.image_embedding_size,) * 2,
        input_image_size=(cfg.image_size,) * 2,
        mask_in_chans=cfg.mask_in_chans).eval()
    mask_decoder = md.MaskDecoder(
        num_multimask_outputs=cfg.num_multimask_outputs,
        transformer=tr.TwoWayTransformer(
            depth=cfg.decoder_depth, embedding_dim=cfg.prompt_embed_dim,
            mlp_dim=cfg.decoder_mlp_dim, num_heads=cfg.decoder_num_heads),
        transformer_dim=cfg.prompt_embed_dim,
        iou_head_depth=cfg.iou_head_depth,
        iou_head_hidden_dim=cfg.iou_head_hidden_dim).eval()

    sd = {}
    for prefix, mod in (("image_encoder.", image_encoder),
                        ("prompt_encoder.", prompt_encoder),
                        ("mask_decoder.", mask_decoder)):
        for k, v in mod.state_dict().items():
            sd[prefix + k] = v
    params = jax.tree_util.tree_map(jnp.asarray, sam_from_torch(sd, cfg))
    return image_encoder, prompt_encoder, mask_decoder, params, cfg


@pytest.mark.slow
def test_image_encoder_parity(torch_sam):
    image_encoder, _, _, params, cfg = torch_sam
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    with torch.no_grad():
        want = image_encoder(torch.tensor(imgs)).numpy()  # [B, C, h, w]
    got = sam_med2d.encode_image(
        params["image_encoder"], jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg)
    got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, want, rtol=1e-3, atol=2e-4)


def test_dense_pe_parity(torch_sam):
    _, prompt_encoder, _, params, cfg = torch_sam
    with torch.no_grad():
        want = prompt_encoder.get_dense_pe().numpy()[0]  # [C, h, w]
    got = sam_med2d.dense_pe(params["prompt_encoder"], cfg)
    np.testing.assert_allclose(
        np.asarray(got).transpose(2, 0, 1), want, rtol=1e-4, atol=1e-5)


def test_text_prompt_and_mask_decode_parity(torch_sam):
    image_encoder, prompt_encoder, mask_decoder, params, cfg = torch_sam
    rng = np.random.default_rng(1)
    B = 3
    text = rng.normal(size=(B, 1, cfg.prompt_embed_dim)).astype(np.float32)
    emb = rng.normal(size=(B, cfg.prompt_embed_dim, cfg.image_embedding_size,
                           cfg.image_embedding_size)).astype(np.float32)
    with torch.no_grad():
        sparse, dense = prompt_encoder(
            points=None, boxes=None, masks=None,
            text_embeds=torch.tensor(text))
        want_masks, want_iou = mask_decoder(
            image_embeddings=torch.tensor(emb),
            image_pe=prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=False)
    sparse_j, dense_j = sam_med2d.encode_prompts(
        params["prompt_encoder"], cfg, B, text_embeds=jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(sparse_j), sparse.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dense_j).transpose(0, 3, 1, 2), dense.detach().numpy(),
        rtol=1e-5, atol=1e-6)
    got_masks, got_iou = sam_med2d.decode_masks(
        params["mask_decoder"], cfg,
        jnp.asarray(emb.transpose(0, 2, 3, 1)),
        sam_med2d.dense_pe(params["prompt_encoder"], cfg),
        sparse_j, dense_j, multimask_output=False)
    np.testing.assert_allclose(np.asarray(got_masks), want_masks.detach().numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.detach().numpy(),
                               rtol=1e-3, atol=1e-3)


def test_point_box_prompts_parity(torch_sam):
    _, prompt_encoder, _, params, cfg = torch_sam
    rng = np.random.default_rng(2)
    coords = rng.uniform(0, cfg.image_size, size=(2, 3, 2)).astype(np.float32)
    labels = np.array([[1, 0, 1], [0, 1, -1]], np.float32)
    boxes = np.array([[4.0, 5.0, 60.0, 70.0], [10.0, 10.0, 30.0, 40.0]],
                     np.float32)
    with torch.no_grad():
        sparse, _ = prompt_encoder(
            points=(torch.tensor(coords), torch.tensor(labels)),
            boxes=torch.tensor(boxes), masks=None, text_embeds=None)
    got_pts = sam_med2d.embed_points(params["prompt_encoder"], cfg,
                                     jnp.asarray(coords), jnp.asarray(labels))
    got_box = sam_med2d.embed_boxes(params["prompt_encoder"], cfg,
                                    jnp.asarray(boxes))
    got = np.concatenate([np.asarray(got_pts), np.asarray(got_box)], axis=1)
    np.testing.assert_allclose(got, sparse.numpy(), rtol=1e-4, atol=1e-5)


def test_mask_input_parity(torch_sam):
    _, prompt_encoder, _, params, cfg = torch_sam
    rng = np.random.default_rng(3)
    size = 4 * cfg.image_embedding_size
    masks = rng.normal(size=(2, 1, size, size)).astype(np.float32)
    with torch.no_grad():
        _, dense = prompt_encoder(points=None, boxes=None,
                                  masks=torch.tensor(masks), text_embeds=None)
    got = sam_med2d.embed_mask_input(
        params["prompt_encoder"], jnp.asarray(masks.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               dense.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_postprocess_matches_torch_interpolate(torch_sam):
    import torch.nn.functional as F
    rng = np.random.default_rng(4)
    low = rng.normal(size=(1, 1, 8, 8)).astype(np.float32)
    want = F.interpolate(torch.tensor(low), (32, 32), mode="bilinear",
                         align_corners=False).numpy()
    got = sam_med2d.postprocess_masks(jnp.asarray(low), 32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
