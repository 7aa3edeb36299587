"""Unit tests for core numeric ops against independent references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.ops.attention import causal_attention, decode_attention
from medplib_tpu.ops.norms import layer_norm, rms_norm
from medplib_tpu.ops.rope import apply_rope, rope_cos_sin


def test_rms_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5)
    want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_layer_norm_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 7, 8)).astype(np.float32)
    w = rng.normal(size=(8,)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    got = layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mu) / np.sqrt(var + 1e-5) * w + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rope_matches_hf():
    torch = pytest.importorskip("torch")
    B, T, H, D = 2, 6, 4, 16
    rng = np.random.default_rng(2)
    x = rng.normal(size=(B, T, H, D)).astype(np.float32)
    pos = np.broadcast_to(np.arange(T)[None], (B, T))
    cos, sin = rope_cos_sin(jnp.asarray(pos), D, theta=10000.0)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))

    # independent HF-style reference in torch
    inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    ang = np.einsum("t,d->td", np.arange(T), inv)
    emb = np.concatenate([ang, ang], axis=-1)
    tcos, tsin = np.cos(emb), np.sin(emb)
    xt = torch.tensor(x)
    x1, x2 = xt[..., : D // 2], xt[..., D // 2:]
    rot = torch.cat([-x2, x1], dim=-1)
    want = xt * torch.tensor(tcos[None, :, None, :]) + rot * torch.tensor(
        tsin[None, :, None, :])
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)


def _naive_causal(q, k, v, mask=None):
    B, T, H, D = q.shape
    S = k.shape[1]
    out = np.zeros_like(q)
    off = S - T
    for b in range(B):
        for h in range(H):
            logit = q[b, :, h] @ k[b, :, h].T / np.sqrt(D)
            for t in range(T):
                for s in range(S):
                    if s > t + off or (mask is not None and not mask[b, s]):
                        logit[t, s] = -1e30
            p = np.exp(logit - logit.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[b, :, h] = p @ v[b, :, h]
    return out


def test_causal_attention_vs_naive():
    rng = np.random.default_rng(3)
    B, T, H, D = 2, 5, 2, 8
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, H, D)).astype(np.float32)
    v = rng.normal(size=(B, T, H, D)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[1, 3:] = False
    got = causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(mask))
    want = _naive_causal(q, k, v, mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gqa_repeat():
    rng = np.random.default_rng(4)
    B, T, H, KV, D = 1, 4, 4, 2, 8
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, KV, D)).astype(np.float32)
    v = rng.normal(size=(B, T, KV, D)).astype(np.float32)
    got = causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    krep = np.repeat(k, H // KV, axis=2)
    vrep = np.repeat(v, H // KV, axis=2)
    want = _naive_causal(q, krep, vrep)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_decode_attention_matches_prefill_last_token():
    """decode step on a cache of length T-1 == last row of prefill attention."""
    rng = np.random.default_rng(5)
    B, T, H, D = 2, 7, 2, 8
    MAX = 16
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, H, D)).astype(np.float32)
    v = rng.normal(size=(B, T, H, D)).astype(np.float32)
    full = causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

    k_cache = np.zeros((B, MAX, H, D), np.float32)
    v_cache = np.zeros((B, MAX, H, D), np.float32)
    k_cache[:, :T] = k
    v_cache[:, :T] = v
    got = decode_attention(jnp.asarray(q[:, -1:]), jnp.asarray(k_cache),
                           jnp.asarray(v_cache),
                           jnp.full((B,), T, jnp.int32))
    np.testing.assert_allclose(got, full[:, -1:], rtol=1e-4, atol=1e-5)


def test_flash_attention_matches_xla():
    from medplib_tpu.ops.pallas.flash_attention import flash_attention
    rng = np.random.default_rng(6)
    B, T, H, D = 1, 256, 2, 128
    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    k = rng.normal(size=(B, T, H, D)).astype(np.float32)
    v = rng.normal(size=(B, T, H, D)).astype(np.float32)
    mask = np.ones((B, T), bool)
    mask[0, 200:] = False
    want = causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(mask), impl="xla")
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(mask), True, (128, 128))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_attention_fused_backward_matches_xla():
    """The fused Pallas backward (dQ pass + dK/dV pass recomputing P from
    the forward's LSE) matches XLA attention gradients, including padding
    mask and non-divisible lengths."""
    import jax
    from medplib_tpu.ops.attention import _xla_attention, make_causal_bias
    from medplib_tpu.ops.pallas.flash_attention import flash_attention
    rng = np.random.default_rng(7)
    B, T, H, D = 2, 72, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    mask = np.ones((B, T), np.int32)
    mask[1, -9:] = 0
    mask = jnp.asarray(mask)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(
            flash_attention(q, k, v, mask, block_sizes=(16, 16))))

    def loss_xla(q, k, v):
        bias = make_causal_bias(mask, T, T)
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, bias)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_flash_attention_backward_no_mask_path():
    """grad through flash_attention with attn_mask=None (all-ones path)."""
    import jax
    from medplib_tpu.ops.pallas.flash_attention import flash_attention
    rng = np.random.default_rng(8)
    B, T, H, D = 1, 32, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    g = jax.grad(lambda q: jnp.sum(
        flash_attention(q, k, v, None, block_sizes=(16, 16))))(q)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.linalg.norm(g)) > 0


def test_flash_attention_backward_fully_masked_row_finite():
    """A batch row whose padding mask is ALL zero (invalid/empty sample)
    must produce finite gradients through the fused backward — the forward
    leaves lse at its -inf-like init for such rows and the backward's
    exp(s - lse) must stay behind the keep-mask select."""
    from medplib_tpu.ops.pallas.flash_attention import flash_attention

    B, T, H, D = 2, 32, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D))
    mask = np.ones((B, T), np.int32)
    mask[1, :] = 0  # row 1 attends to nothing
    mask = jnp.asarray(mask)

    def loss(q, k, v):
        return jnp.sum(jnp.square(
            flash_attention(q, k, v, mask, block_sizes=(16, 16))))

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert bool(jnp.all(jnp.isfinite(g))), "non-finite grads"
