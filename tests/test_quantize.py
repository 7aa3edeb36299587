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


def test_int4_quantize_dequant_exact_on_grid():
    """Values already on a 15-level symmetric grid survive int4 round-trip
    exactly, in both kernel layouts, including stacked leading dims."""
    from medplib_tpu.train.lora import dequant_kernel
    rng = np.random.default_rng(0)
    for name, shape in (("down_proj", (3, 64, 32)),  # normal [L, in, out]
                        ("q_proj", (3, 32, 64))):    # transposed [L, out, in]
        levels = rng.integers(-7, 8, size=shape).astype(np.float32)
        # pin one |7| per reduction block so every block's scale is exactly
        # one grid step (blocks of 8 along in: axis 1 normal, axis 2 transp.)
        if name == "down_proj":
            levels[:, ::8, :] = 7.0
        else:
            levels[:, :, ::8] = 7.0
        scales = rng.uniform(0.5, 2.0, size=shape[:1] + (1,) * 2)
        w = levels * scales
        tree = {name: {"kernel": jnp.asarray(w)}}
        q = quantize_tree(tree, skip=(), bits=4, block=8)
        node = q[name]
        assert node["kernel"].dtype == jnp.int8
        assert "scale4" in node and "scale" not in node
        # packed along the reduction axis -> half the bytes of int8
        assert node["kernel"].size == w.size // 2
        back = np.asarray(dequant_kernel(node, jnp.float32))
        np.testing.assert_allclose(back, w, rtol=1e-5, atol=1e-5)


def test_int4_forward_close_to_fp32():
    cfg = LlamaConfig.tiny()
    params = llama.init_llama(jax.random.PRNGKey(0), cfg)
    ids = jnp.arange(12).reshape(1, 12) % cfg.vocab_size
    h_fp, _, _ = llama.forward(params, cfg, llama.embed(params, ids))
    qparams = quantize_tree(params, bits=4)
    assert qparams["layers"]["attn"]["q_proj"]["kernel"].dtype == jnp.int8
    assert "scale4" in qparams["layers"]["attn"]["q_proj"]
    # packed: half the elements of the original kernel
    assert (qparams["layers"]["mlp"]["gate_proj"]["kernel"].size
            == cfg.num_layers * cfg.hidden_size * cfg.intermediate_size // 2)
    h_q, _, _ = llama.forward(qparams, cfg, llama.embed(qparams, ids))
    rel = float(jnp.linalg.norm(h_q - h_fp) / jnp.linalg.norm(h_fp))
    # tiny random nets (h=128) amplify 4-bit error vs a real checkpoint;
    # exactness is covered by the grid test, consistency by the decode test
    assert rel < 0.35, rel


def test_int4_decode_consistent():
    cfg = LlamaConfig.tiny()
    params = quantize_tree(llama.init_llama(jax.random.PRNGKey(1), cfg),
                           bits=4)
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


def test_int4_rejects_bad_bits():
    import pytest
    with pytest.raises(ValueError, match="bits"):
        quantize_tree({}, bits=3)


def test_pallas_int8_matmul_matches_xla_dequant():
    """ops/pallas/int8_matmul (decode-regime streaming dequant) == XLA
    dequant matmul, both layouts, including K=11008 (budget-shrunk blocks)
    and a non-128-divisible N (padded output channels)."""
    from medplib_tpu.ops.pallas.int8_matmul import int8_matmul, int8_matmul_t
    rng = np.random.default_rng(0)
    for m, k, n, transposed in ((12, 256, 320, False), (12, 256, 320, True),
                                (8, 11008 // 16, 128, False)):
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        if transposed:
            w = rng.integers(-127, 128, size=(n, k)).astype(np.int8)
            s = rng.uniform(0.01, 0.1, size=(n, 1)).astype(np.float32)
            got = int8_matmul_t(x, jnp.asarray(w), jnp.asarray(s))
            want = x @ (w.astype(np.float32) * s).T
        else:
            w = rng.integers(-127, 128, size=(k, n)).astype(np.int8)
            s = rng.uniform(0.01, 0.1, size=(1, n)).astype(np.float32)
            got = int8_matmul(x, jnp.asarray(w), jnp.asarray(s))
            want = x @ (w.astype(np.float32) * s)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                   atol=2e-3)


def test_w8a8_dynamic_activation_matmul():
    """int8_dyn_matmul (W8A8 prefill path) approximates the dequant matmul,
    and lora.linear routes through it only under dynamic_act_quant() with
    prefill-sized M."""
    from medplib_tpu.train.lora import linear, linear_t
    from medplib_tpu.utils.quantize import (dynamic_act_quant,
                                            int8_dyn_matmul)
    rng = np.random.default_rng(0)
    K, N = 256, 512
    w = rng.normal(size=(K, N)).astype(np.float32)
    node = quantize_tree({"up_proj": {"kernel": jnp.asarray(w)}},
                         skip=())["up_proj"]
    x = jnp.asarray(rng.normal(size=(600, K)).astype(np.float32))
    want = np.asarray(x) @ w
    got = np.asarray(int8_dyn_matmul(x, node["kernel"], node["scale"],
                                     transposed=False))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel   # w8 + a8 double quantization error

    # routing: only under the context AND only at prefill M
    base = np.asarray(linear(node, x))
    with dynamic_act_quant():
        w8a8 = np.asarray(linear(node, x))
        small = np.asarray(linear(node, x[:8]))
    assert not np.allclose(w8a8, base)          # int8 MXU path engaged
    np.testing.assert_allclose(                 # decode-sized M: unchanged
        small, base[:8], rtol=1e-5, atol=1e-5)
    rel = np.linalg.norm(w8a8 - want) / np.linalg.norm(want)
    assert rel < 0.02, rel

    # transposed layout
    wt = rng.normal(size=(N, K)).astype(np.float32)
    node_t = quantize_tree({"q_proj": {"kernel": jnp.asarray(wt)}},
                           skip=())["q_proj"]
    with dynamic_act_quant():
        got_t = np.asarray(linear_t(node_t, x))
    want_t = np.asarray(x) @ wt.T
    rel = np.linalg.norm(got_t - want_t) / np.linalg.norm(want_t)
    assert rel < 0.02, rel


def test_pallas_w8a8_kernel_matches_reference():
    """The fused W8A8 Pallas kernel (interpret mode on CPU) matches the
    explicit quantize->dot->rescale composition, both layouts, padded N."""
    from medplib_tpu.ops.pallas.int8_matmul import w8a8_matmul, w8a8_matmul_t
    rng = np.random.default_rng(1)
    M, K, N = 70, 256, 320
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))

    def ref(xv, w, s, transposed):
        xf = np.asarray(xv, np.float32)
        am = np.maximum(np.abs(xf).max(-1, keepdims=True), 1e-12) / 127.0
        xq = np.clip(np.round(xf / am), -127, 127)
        wf = w.astype(np.float32)
        y = (xq @ (wf.T if transposed else wf))
        return y * am * (s.reshape(1, -1))

    w = rng.integers(-127, 128, size=(K, N)).astype(np.int8)
    s = rng.uniform(0.01, 0.1, size=(1, N)).astype(np.float32)
    got = np.asarray(w8a8_matmul(x, jnp.asarray(w), jnp.asarray(s)))
    np.testing.assert_allclose(got, ref(x, w, s, False), rtol=2e-3, atol=2e-3)

    wt = rng.integers(-127, 128, size=(N, K)).astype(np.int8)
    st = rng.uniform(0.01, 0.1, size=(N, 1)).astype(np.float32)
    got_t = np.asarray(w8a8_matmul_t(x, jnp.asarray(wt), jnp.asarray(st)))
    np.testing.assert_allclose(got_t, ref(x, wt, st, True), rtol=2e-3,
                               atol=2e-3)


def test_quantized_projector_applies_scales():
    """Regression: apply_projector consumed raw int8 kernels without their
    scales (and nibble-packed int4 kernels without unpacking — a shape
    error). The projector is quantize-eligible (not in SKIP_MODULES), so it
    must route through the dequant-aware linear."""
    import copy

    from medplib_tpu.config import ProjectorConfig
    from medplib_tpu.models import projector

    cfg = ProjectorConfig(projector_type="mlp2x_gelu", mm_hidden_size=128,
                          hidden_size=128)
    params = projector.init_projector(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 128))
    y_fp = projector.apply_projector(params, x)
    for bits in (8, 4):
        qp = quantize_tree(copy.deepcopy({"mm_projector": params}),
                           bits=bits)["mm_projector"]
        kern = qp["layers"][0]["kernel"]
        assert kern.dtype == jnp.int8  # actually quantized (not skipped)
        if bits == 4:
            assert kern.shape[0] == 64  # nibble-packed along the in axis
        y_q = projector.apply_projector(qp, x)
        assert y_q.shape == y_fp.shape
        rel = float(jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp))
        # int4 noise compounds through the 2-layer GELU MLP at this size
        assert rel < (0.25 if bits == 4 else 0.06), (bits, rel)


def test_residual_moe_coefficient_never_quantized():
    """The Residual-MoE 2-way mixing gate is numerics-sensitive like the
    router: quantize_tree must leave it alone even when its stacked kernel
    exceeds the size threshold (it used to be consumed raw int8)."""
    tree = {"layers": {"moe": {
        "coefficient": {"kernel": jnp.ones((8, 4096, 2), jnp.float32),
                        "bias": jnp.zeros((2,), jnp.float32)},
        "experts": {"gate_proj": {"kernel": jnp.ones((8, 128, 256),
                                            jnp.float32)}},
    }}}
    q = quantize_tree(tree)
    assert q["layers"]["moe"]["coefficient"]["kernel"].dtype == jnp.float32
    assert "scale" not in q["layers"]["moe"]["coefficient"]
    assert q["layers"]["moe"]["experts"]["gate_proj"]["kernel"].dtype == \
        jnp.int8
