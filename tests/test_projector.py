"""Projector / TokenCompressor / MaskTokenEncoder / region pooling parity
against torch replicas of the reference modules (medplib_arch.py:67-108,
580-613; multimodal_projector/builder.py:33-51)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import ProjectorConfig
from medplib_tpu.models import projector as proj

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


def _to_jax_linear(lin: nn.Linear):
    return {"kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy())}


def _to_jax_ln(ln: nn.LayerNorm):
    return {"weight": jnp.asarray(ln.weight.detach().numpy()),
            "bias": jnp.asarray(ln.bias.detach().numpy())}


def test_mlp2x_gelu_projector_parity():
    torch.manual_seed(0)
    tmod = nn.Sequential(nn.Linear(32, 48), nn.GELU(), nn.Linear(48, 48))
    x = torch.randn(2, 5, 32)
    with torch.no_grad():
        want = tmod(x).numpy()
    params = {"layers": [_to_jax_linear(tmod[0]), _to_jax_linear(tmod[2])]}
    got = proj.apply_projector(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_token_compressor_parity():
    torch.manual_seed(1)
    hidden, n_out = 32, 7
    pool = nn.AdaptiveAvgPool1d(n_out)
    norm = nn.LayerNorm(hidden)
    lin = nn.Linear(hidden, hidden)
    x = torch.randn(2, 18, hidden)  # 18 -> 7: non-integer ratio bins
    with torch.no_grad():
        want = lin(norm(pool(x.transpose(1, 2)).transpose(1, 2))).numpy()
    params = {"norm": _to_jax_ln(norm), "proj": _to_jax_linear(lin)}
    got = proj.apply_token_compressor(params, jnp.asarray(x.numpy()), n_out)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_mask_encoder_parity():
    torch.manual_seed(2)
    hidden, n_tokens = 24, 5
    enc = nn.Sequential(
        nn.Conv2d(1, 64, 3, 2, 1), nn.GELU(),
        nn.Conv2d(64, 128, 3, 2, 1), nn.GELU(),
        nn.Conv2d(128, 256, 3, 2, 1), nn.GELU(),
        nn.Conv2d(256, 256, 3, 2, 1), nn.GELU())
    pool = nn.AdaptiveAvgPool1d(n_tokens)
    lin = nn.Linear(256, hidden)
    norm = nn.LayerNorm(hidden)
    masks = (torch.rand(2, 32, 32) > 0.5).float()
    with torch.no_grad():
        f = enc(masks.unsqueeze(1))
        want = norm(lin(pool(f.flatten(2)).transpose(1, 2))).numpy()

    convs = []
    for layer in [enc[0], enc[2], enc[4], enc[6]]:
        convs.append({
            "kernel": jnp.asarray(
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(layer.bias.detach().numpy())})
    params = {"convs": convs, "proj": _to_jax_linear(lin),
              "norm": _to_jax_ln(norm)}
    got = proj.apply_mask_encoder(params, jnp.asarray(masks.numpy()), n_tokens)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def _reference_region_pool(feature_map, mask):
    """The reference extract_region_feature path for one mask, in torch
    (medplib_arch.py:580-613): nonzero coords / (h,w), grid_sample
    align_corners=True, mean."""
    h = w = int(np.sqrt(feature_map.shape[0]))
    c = feature_map.shape[-1]
    pos = torch.tensor(np.argwhere(mask), dtype=torch.float32)
    pos = pos / torch.tensor([float(h), float(w)])
    fmap = torch.tensor(feature_map).reshape(h, w, c).permute(2, 0, 1)[None]
    grid = (2.0 * pos.flip(dims=(1,)) - 1.0)[None, :, None, :]
    sampled = F.grid_sample(fmap, grid, align_corners=True)  # [1,C,P,1]
    return sampled[0, :, :, 0].mean(dim=1).numpy()


def test_region_pool_matches_grid_sample_reference():
    rng = np.random.default_rng(3)
    h = w = 8
    c = 16
    fmap = rng.normal(size=(h * w, c)).astype(np.float32)
    masks = np.zeros((1, 2, h, w), np.float32)
    masks[0, 0, 2:5, 3:7] = 1
    masks[0, 1, 0:2, 0:2] = 1
    valid = np.ones((1, 2), bool)

    got = proj.region_pool(jnp.asarray(fmap)[None], jnp.asarray(masks),
                           jnp.asarray(valid))
    for m in range(2):
        want = _reference_region_pool(fmap, masks[0, m])
        np.testing.assert_allclose(np.asarray(got)[0, m], want, rtol=1e-4,
                                   atol=1e-5)


def test_region_pool_invalid_mask_zero():
    fmap = jnp.ones((1, 64, 4))
    masks = jnp.zeros((1, 1, 8, 8))
    got = proj.region_pool(fmap, masks, jnp.zeros((1, 1), bool))
    assert not np.isnan(np.asarray(got)).any()
    np.testing.assert_array_equal(np.asarray(got), 0.0)
