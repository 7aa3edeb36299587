"""Int8 weight-only quantization: accuracy + generation still works."""

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.config import LlamaConfig
from medplib_tpu.models import llama
from medplib_tpu.utils.quantize import quantize_tree


def test_quantized_forward_close_to_fp32():
    cfg = LlamaConfig.tiny()
    params = llama.init_llama(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(12).reshape(1, 12) % cfg.vocab_size
    h_fp, _, _ = llama.forward(params, cfg, llama.embed(params, ids))
    qparams = quantize_tree(params)  # NOTE: mutates in place (donation)
    # attention + mlp kernels quantized, embeddings/norms untouched
    assert qparams["layers"]["attn"]["q_proj"]["kernel"].dtype == jnp.int8
    assert qparams["layers"]["mlp"]["gate_proj"]["kernel"].dtype == jnp.int8
    assert qparams["embed_tokens"]["embedding"].dtype != jnp.int8

    h_q, _, _ = llama.forward(qparams, cfg, llama.embed(qparams, ids))
    rel = float(jnp.linalg.norm(h_q - h_fp) / jnp.linalg.norm(h_fp))
    assert rel < 0.05, rel


def test_quantized_decode_consistent():
    cfg = LlamaConfig.tiny()
    params = quantize_tree(llama.init_llama(jax.random.PRNGKey(1), cfg))
    B, T, MAX = 1, 6, 12
    ids = jnp.arange(T).reshape(B, T) % cfg.vocab_size
    full, _, _ = llama.forward(params, cfg, llama.embed(params, ids))
    cache = llama.KVCache.init(cfg, B, MAX, dtype=jnp.float32)
    _, cache, _ = llama.forward(params, cfg, llama.embed(params, ids[:, :-1]),
                                cache=cache)
    step, _ = llama.forward_decode(params, cfg,
                                   llama.embed(params, ids[:, -1:]), cache)
    np.testing.assert_allclose(np.asarray(step), np.asarray(full[:, -1:]),
                               rtol=1e-4, atol=1e-4)
