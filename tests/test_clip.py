"""CLIP vision tower parity vs HF CLIPVisionModel (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import ClipVisionConfig
from medplib_tpu.models import clip
from medplib_tpu.utils.hf_weights import clip_vision_from_hf


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    import transformers

    cfg = ClipVisionConfig(
        image_size=56, patch_size=14, hidden_size=64, intermediate_size=128,
        num_layers=4, num_heads=4, select_layer=-2)
    hf_cfg = transformers.CLIPVisionConfig(
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        hidden_act="quick_gelu", layer_norm_eps=cfg.layer_norm_eps,
        attention_dropout=0.0, attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, clip_vision_from_hf(hf.state_dict(), cfg))
    return hf, params, cfg


def test_feature_parity_select_minus2(hf_pair):
    torch = pytest.importorskip("torch")
    hf, params, cfg = hf_pair
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(imgs), output_hidden_states=True)
    want = out.hidden_states[cfg.select_layer][:, 1:].numpy()  # drop CLS

    got = clip.forward_features(
        params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)


def test_feature_parity_last_layer(hf_pair):
    torch = pytest.importorskip("torch")
    hf, params, cfg = hf_pair
    import dataclasses
    cfg2 = dataclasses.replace(cfg, select_layer=-1, select_feature="cls_patch")
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(1, 3, cfg.image_size, cfg.image_size)).astype(
        np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(imgs), output_hidden_states=True)
    want = out.hidden_states[-1].numpy()
    got = clip.forward_features(
        params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), cfg2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)
