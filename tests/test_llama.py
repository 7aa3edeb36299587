"""Dense LLaMA: parity vs HF torch LlamaForCausalLM + decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import LlamaConfig
from medplib_tpu.models import llama
from medplib_tpu.utils.hf_weights import llama_from_hf


def _tiny_cfg():
    return LlamaConfig.tiny(vocab_size=128)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    import transformers

    cfg = _tiny_cfg()
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        attention_dropout=0.0, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = hf.state_dict()
    params = llama_from_hf(sd, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return hf, params, cfg


def test_forward_parity(hf_pair):
    torch = pytest.importorskip("torch")
    hf, params, cfg = hf_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    mask = np.ones_like(ids)
    mask[1, 7:] = 0
    ids_m = ids * mask  # padded positions get id 0

    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids_m),
                 attention_mask=torch.tensor(mask),
                 output_hidden_states=True)
    want_logits = out.logits.numpy()
    want_hidden = out.hidden_states[-1].numpy()

    embeds = llama.embed(params, jnp.asarray(ids_m))
    hidden, _, _ = llama.forward(params, cfg, embeds, jnp.asarray(mask))
    got_logits = llama.logits(params, hidden)

    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(hidden)[valid], want_hidden[valid], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got_logits)[valid], want_logits[valid], rtol=2e-4, atol=2e-3)


def test_prefill_then_decode_matches_full_forward(hf_pair):
    _, params, cfg = hf_pair
    rng = np.random.default_rng(1)
    B, T = 2, 8
    MAX = 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)))

    # full forward over T tokens
    full_hidden, _, _ = llama.forward(params, cfg, llama.embed(params, ids))

    # prefill T-1, then decode token T-1
    cache = llama.KVCache.init(cfg, B, MAX, dtype=jnp.float32)
    _, cache, _ = llama.forward(params, cfg, llama.embed(params, ids[:, :-1]),
                                cache=cache)
    step_hidden, cache2 = llama.forward_decode(
        params, cfg, llama.embed(params, ids[:, -1:]), cache)
    np.testing.assert_allclose(np.asarray(step_hidden),
                               np.asarray(full_hidden[:, -1:]),
                               rtol=1e-4, atol=1e-4)
    assert int(cache2.length[0]) == T


def test_remat_matches(hf_pair):
    _, params, cfg = hf_pair
    ids = jnp.asarray(np.arange(12).reshape(1, 12) % cfg.vocab_size)
    embeds = llama.embed(params, ids)
    h1, _, _ = llama.forward(params, cfg, embeds, remat=False)
    h2, _, _ = llama.forward(params, cfg, embeds, remat=True)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5,
                               atol=1e-5)


def test_int8_kv_cache_decode_parity(hf_pair):
    """int8 KV cache (VERDICT round-2 task 7): per-token-per-head scales;
    decode hidden states track the bf16-cache path within quantization
    tolerance, and the cache stores int8 + f32 scales."""
    _, params, cfg = hf_pair
    rng = np.random.default_rng(2)
    B, T, MAX = 2, 8, 16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)))

    cache_f = llama.KVCache.init(cfg, B, MAX, dtype=jnp.float32)
    cache_q = llama.KVCache.init(cfg, B, MAX, quant=True)
    assert cache_q.quantized and not cache_f.quantized
    assert cache_q.k.dtype == jnp.int8
    assert cache_q.k_scale.shape == cache_q.k.shape[:-1] + (1,)

    emb = llama.embed(params, ids[:, :-1])
    _, cache_f, _ = llama.forward(params, cfg, emb, cache=cache_f)
    _, cache_q, _ = llama.forward(params, cfg, emb, cache=cache_q)
    assert cache_q.k.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(cache_f.length),
                                  np.asarray(cache_q.length))

    hf_steps, hq_steps = [], []
    for t in range(3):
        step = llama.embed(params, ids[:, -1:])
        hf_, cache_f = llama.forward_decode(params, cfg, step, cache_f)
        hq_, cache_q = llama.forward_decode(params, cfg, step, cache_q)
        hf_steps.append(np.asarray(hf_))
        hq_steps.append(np.asarray(hq_))
    assert cache_q.k.dtype == jnp.int8  # stays quantized across steps
    for hf_, hq_ in zip(hf_steps, hq_steps):
        # int8 quantization noise: ~1% relative on hidden states
        err = np.abs(hf_ - hq_) / (np.abs(hf_).mean() + 1e-6)
        assert err.max() < 0.15 and err.mean() < 0.02, (err.max(), err.mean())


def test_int8_kv_cache_generate_tokens(hf_pair):
    """End-to-end generate with kv_quant stays greedy-token-identical on a
    well-separated tiny model."""
    import test_medplib as tm
    from medplib_tpu.config import MedplibConfig
    from medplib_tpu.models import medplib as med
    cfg = MedplibConfig.tiny()
    params = med.init_medplib(jax.random.PRNGKey(0), cfg)
    batch = tm._make_batch(cfg, B=2, T=10, seed=0)
    r_f = med.generate(params, cfg, batch, max_new_tokens=6)
    r_q = med.generate(params, cfg, batch, max_new_tokens=6, kv_quant=True)
    agree = (np.asarray(r_f.output_ids) == np.asarray(r_q.output_ids)).mean()
    assert agree >= 0.8, (np.asarray(r_f.output_ids),
                          np.asarray(r_q.output_ids))
    assert r_q.pred_masks.shape == r_f.pred_masks.shape


@pytest.mark.slow
def test_stacked_w8a8_attention_prefill_parity(monkeypatch):
    """The whole-stack layer-indexed W8A8 attention path (ops/stacked.py;
    OPT-IN via MEDPLIB_STACK_ATTN=1 — measured slower than the XLA
    weight-only composition end-to-end at attention shapes, see
    llama.forward) matches the weight-only XLA path within W8A8
    quantization tolerance, and the eligibility gate behaves."""
    monkeypatch.setenv("MEDPLIB_STACK_ATTN", "1")
    from medplib_tpu.ops.stacked import stack_attn_for_w8a8
    from medplib_tpu.utils.quantize import dynamic_act_quant, quantize_tree

    cfg = LlamaConfig(num_layers=2, hidden_size=1024, intermediate_size=512,
                      num_heads=8, num_kv_heads=8, vocab_size=128,
                      max_position_embeddings=1024)
    params = llama.init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    params = quantize_tree(params)
    B, T = 2, 512  # S = 1024: prefill-regime
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size),
                          jnp.float32) * 0.1

    st = stack_attn_for_w8a8(params["layers"], B * T)
    assert st is not None
    assert st["q_proj"]["transposed"] and not st["o_proj"]["transposed"]
    assert st["q_proj"]["scale"].shape == (2, 1, 1024)
    # small prefills and non-int8 trees are ineligible
    assert stack_attn_for_w8a8(params["layers"], 64) is None

    y_ref, _, _ = llama.forward(params, cfg, x, train=False) \
        if "train" in llama.forward.__code__.co_varnames else \
        llama.forward(params, cfg, x)
    with dynamic_act_quant(True):
        y_stacked, _, _ = llama.forward(params, cfg, x)
    rel = float(jnp.linalg.norm(y_stacked.astype(jnp.float32)
                                - y_ref.astype(jnp.float32))
                / (jnp.linalg.norm(y_ref.astype(jnp.float32)) + 1e-9))
    assert rel < 0.05, rel

    # decode is untouched by the stacked path: same program as before
    bf = llama.init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    y_bf, _, _ = llama.forward(bf, cfg, x)
    rel_q = float(jnp.linalg.norm(y_ref.astype(jnp.float32)
                                  - y_bf.astype(jnp.float32))
                  / (jnp.linalg.norm(y_bf.astype(jnp.float32)) + 1e-9))
    assert rel < max(0.05, 3 * rel_q + 0.02), (rel, rel_q)


def test_stacked_w8a8_dense_mlp_prefill_parity(monkeypatch):
    """The whole-stack layer-indexed W8A8 dense-MLP path (ops/stacked.
    stack_mlp_for_w8a8; OPT-IN via MEDPLIB_STACK_MLP=1 — measured slower
    than the XLA W8A8 composition end-to-end, see llama.forward): the
    pad_dense_mlp_for_gmm storage pad is exact on the weight-only path,
    the eligibility gate behaves (unpadded M / small prefill -> None),
    and the stacked forward matches weight-only within W8A8 tolerance."""
    monkeypatch.setenv("MEDPLIB_STACK_MLP", "1")
    from medplib_tpu.ops.stacked import stack_mlp_for_w8a8
    from medplib_tpu.utils.quantize import (dynamic_act_quant,
                                            pad_dense_mlp_for_gmm,
                                            quantize_tree)

    cfg = LlamaConfig(num_layers=2, hidden_size=1024, intermediate_size=576,
                      num_heads=8, num_kv_heads=8, vocab_size=128,
                      max_position_embeddings=1024)
    params = llama.init_llama(jax.random.PRNGKey(0), cfg, jnp.float32)
    params = quantize_tree(params)
    B, T = 2, 512
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size),
                          jnp.float32) * 0.1

    # unpadded M=576 is gmm-ineligible: the XLA path serves it unchanged
    assert stack_mlp_for_w8a8(params["layers"], B * T) is None
    y_ref, _, _ = llama.forward(params, cfg, x)

    # int8-in-place pad 576 -> 1024: weight-only output is IDENTICAL
    params["layers"]["mlp"] = pad_dense_mlp_for_gmm(params["layers"]["mlp"])
    assert params["layers"]["mlp"]["gate_proj"]["kernel"].shape == \
        (2, 1024, 1024)
    assert params["layers"]["mlp"]["gate_proj"]["scale"].shape[-1] == 1024
    assert params["layers"]["mlp"]["down_proj"]["scale"].shape[-1] == 1024
    y_pad, _, _ = llama.forward(params, cfg, x)
    np.testing.assert_allclose(np.asarray(y_pad, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=1e-5, atol=1e-5)

    st = stack_mlp_for_w8a8(params["layers"], B * T)
    assert st is not None and not st["down_proj"]["transposed"]
    assert stack_mlp_for_w8a8(params["layers"], 64) is None

    with dynamic_act_quant(True):
        y_stacked, _, _ = llama.forward(params, cfg, x)
    rel = float(jnp.linalg.norm(y_stacked.astype(jnp.float32)
                                - y_ref.astype(jnp.float32))
                / (jnp.linalg.norm(y_ref.astype(jnp.float32)) + 1e-9))
    assert rel < 0.05, rel
