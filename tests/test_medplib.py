"""Composite MedPLIB model: train forward, gradients, generation."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import IMAGE_TOKEN_INDEX, MedplibConfig, MoeConfig
from medplib_tpu.models import medplib


@pytest.fixture(scope="module")
def tiny_model():
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _make_batch(cfg, B=2, T=12, seed=0, with_seg=True, with_region=False):
    rng = np.random.default_rng(seed)
    ids = rng.integers(3, 400, size=(B, T))
    ids[:, 0] = 1
    ids[:, 2] = IMAGE_TOKEN_INDEX
    if with_seg:
        ids[:, 8] = cfg.seg_token_idx
    mask = np.ones((B, T), np.int32)
    labels = ids.copy()
    labels[:, :4] = -100
    vs = cfg.vision.image_size
    ss = cfg.sam.image_size
    n_img = 1
    batch = medplib.Batch.make(
        input_ids=jnp.asarray(ids), input_mask=jnp.asarray(mask),
        labels=jnp.asarray(labels),
        images_clip=jnp.asarray(
            rng.normal(size=(B, n_img, vs, vs, 3)).astype(np.float32)),
        images_sam=jnp.asarray(
            rng.uniform(0, 255, size=(B, ss, ss, 3)).astype(np.float32)),
        image_token_lengths=jnp.full((B, n_img),
                                     cfg.vision.num_patches, jnp.int32),
        region_masks=(jnp.asarray(
            (rng.uniform(size=(B, 1, vs // cfg.vision.patch_size,
                               vs // cfg.vision.patch_size)) > 0.7
             ).astype(np.float32))
            if with_region else None),
        region_valid=(jnp.ones((B, 1), bool) if with_region else None),
        gt_masks=jnp.asarray(
            (rng.uniform(size=(B, 1, ss, ss)) > 0.5).astype(np.float32)),
        mask_valid=jnp.ones((B, 1), bool),
        sam_frame=ss,
    )
    return batch


def test_model_forward_losses_finite(tiny_model):
    cfg, params = tiny_model
    batch = _make_batch(cfg)
    out = medplib.model_forward(params, cfg, batch, train=True)
    for k in ("loss", "ce_loss", "mask_bce_loss", "mask_dice_loss"):
        assert np.isfinite(float(out[k])), k
    assert float(out["mask_loss"]) > 0


def test_model_forward_no_seg_flag(tiny_model):
    cfg, params = tiny_model
    batch = _make_batch(cfg, with_seg=False)
    out = medplib.model_forward(params, cfg, batch, seg_flag=False)
    assert float(out["mask_loss"]) == 0.0
    assert np.isfinite(float(out["loss"]))


def test_region_path(tiny_model):
    cfg, params = tiny_model
    batch = _make_batch(cfg, with_region=True)
    out = medplib.model_forward(params, cfg, batch, rp_flag=True)
    assert np.isfinite(float(out["loss"]))


@pytest.mark.slow
def test_gradients_flow_to_trainable_heads(tiny_model):
    cfg, params = tiny_model
    batch = _make_batch(cfg)

    def loss_fn(p):
        return medplib.model_forward(p, cfg, batch, train=True)["loss"]

    grads = jax.grad(loss_fn)(params)
    g_fcs = np.asarray(grads["text_hidden_fcs"]["fc1"]["kernel"])
    g_dec = np.asarray(
        grads["sam"]["mask_decoder"]["transformer"]["layers"][0]["self_attn"]
        ["q_proj"]["kernel"])
    g_enc = np.asarray(
        grads["sam"]["image_encoder"]["patch_embed"]["kernel"])
    g_clip = np.asarray(
        grads["clip"]["embeddings"]["patch_embedding"]["kernel"])
    assert np.abs(g_fcs).sum() > 0, "text_hidden_fcs got no gradient"
    assert np.abs(g_dec).sum() > 0, "mask decoder got no gradient"
    assert np.abs(g_enc).sum() == 0, "frozen SAM encoder got gradient"
    assert np.abs(g_clip).sum() == 0, "frozen CLIP tower got gradient"


def test_generate_shapes_and_seg_capture(tiny_model):
    cfg, params = tiny_model
    batch = _make_batch(cfg, with_seg=True)
    res = medplib.generate(params, cfg, batch, max_new_tokens=5)
    B = batch.input_ids.shape[0]
    assert res.output_ids.shape == (B, 5)
    assert res.pred_masks.shape == (B, 1, cfg.sam.image_size,
                                    cfg.sam.image_size)
    # SEG token present in the prompt -> has_seg must be True
    assert bool(res.has_seg.all())
    assert np.isfinite(np.asarray(res.pred_masks)).all()


def test_moe_variant_runs(tiny_model):
    cfg0, _ = tiny_model
    cfg = dataclasses.replace(
        cfg0, moe=MoeConfig(enable=True, num_experts=2, top_k=1,
                            capacity_factor=4.0, eval_capacity_factor=4.0,
                            moe_mode="dense"))
    params = medplib.init_medplib(jax.random.PRNGKey(1), cfg)
    batch = _make_batch(cfg)
    out = medplib.model_forward(params, cfg, batch, train=True)
    assert np.isfinite(float(out["loss"]))
    res = medplib.generate(params, cfg, batch, max_new_tokens=3)
    assert res.output_ids.shape[1] == 3
