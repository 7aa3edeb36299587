"""MPT legacy-parity decoder: ALiBi slopes vs reference formula, cache
consistency, prefix-LM attention."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.models import mpt


def ref_slopes(n_heads, bias_max=8):
    """Reference gen_slopes (attention.py:497-504) in numpy."""
    pow2 = 2 ** math.ceil(math.log2(n_heads))
    m = np.arange(1, pow2 + 1, dtype=np.float32) * (bias_max / pow2)
    s = 1.0 / np.power(2.0, m)
    if pow2 != n_heads:
        s = np.concatenate([s[1::2], s[::2]])[:n_heads]
    return s


@pytest.mark.parametrize("n_heads", [4, 6, 16])
def test_alibi_slopes_match_reference(n_heads):
    np.testing.assert_allclose(np.asarray(mpt.alibi_slopes(n_heads)),
                               ref_slopes(n_heads), rtol=1e-6)


@pytest.mark.slow
def test_forward_shapes_and_cache_consistency():
    cfg = mpt.MptConfig.tiny()
    params = mpt.init_mpt(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                             cfg.vocab_size)
    full, _ = mpt.forward(params, cfg, ids)
    assert full.shape == (2, 12, cfg.vocab_size)

    # incremental: prefill 8, decode 4 one at a time == full forward
    logits, cache = mpt.forward(params, cfg, ids[:, :8])
    outs = [logits[:, -1]]
    for i in range(8, 12):
        logits, cache = mpt.forward(params, cfg, ids[:, i:i + 1], past=cache)
        outs.append(logits[:, -1])
    np.testing.assert_allclose(np.asarray(jnp.stack(outs[:-1], 1)),
                               np.asarray(full[:, 7:11]), atol=2e-4)


def test_alibi_no_learned_pos():
    cfg = mpt.MptConfig(d_model=64, n_heads=4, n_layers=2, vocab_size=128,
                        alibi=True, learned_pos_emb=False)
    params = mpt.init_mpt(jax.random.PRNGKey(0), cfg)
    assert "wpe" not in params
    ids = jax.random.randint(jax.random.PRNGKey(7), (1, 6), 0, 128)
    logits, _ = mpt.forward(params, cfg, ids)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # bias: -slope * |distance|, 0 on the diagonal
    bias = np.asarray(mpt.alibi_bias(4, jnp.arange(6), jnp.arange(6)))
    assert np.allclose(np.diagonal(bias, axis1=1, axis2=2), 0.0)
    np.testing.assert_allclose(bias[:, 5, 0], -ref_slopes(4) * 5, rtol=1e-6)


def test_prefix_lm_sees_future_inside_prefix():
    cfg = mpt.MptConfig(d_model=64, n_heads=4, n_layers=1, vocab_size=128,
                        prefix_lm=True)
    params = mpt.init_mpt(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 128)
    prefix = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], bool)
    base, _ = mpt.forward(params, cfg, ids, prefix_mask=prefix)
    # perturb a LATER token inside the prefix: position-0 logits must change
    ids2 = ids.at[0, 3].set((ids[0, 3] + 1) % 128)
    pert, _ = mpt.forward(params, cfg, ids2, prefix_mask=prefix)
    assert not np.allclose(np.asarray(base[0, 0]), np.asarray(pert[0, 0]))
    # ...but a perturbation after the prefix must NOT leak backwards
    ids3 = ids.at[0, 6].set((ids[0, 6] + 1) % 128)
    pert2, _ = mpt.forward(params, cfg, ids3, prefix_mask=prefix)
    np.testing.assert_allclose(np.asarray(base[0, 0]),
                               np.asarray(pert2[0, 0]), atol=1e-5)


def test_clip_qkv_and_qk_ln_paths():
    cfg = mpt.MptConfig(d_model=64, n_heads=4, n_layers=1, vocab_size=128,
                        clip_qkv=0.01, qk_ln=True)
    params = mpt.init_mpt(jax.random.PRNGKey(0), cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    logits, _ = mpt.forward(params, cfg, ids)
    assert bool(jnp.all(jnp.isfinite(logits)))


@pytest.mark.slow
def test_greedy_generate():
    cfg = mpt.MptConfig.tiny()
    params = mpt.init_mpt(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 5), 0,
                             cfg.vocab_size)
    out = mpt.greedy_generate(params, cfg, ids, max_new_tokens=4)
    assert out.shape == (2, 4)
