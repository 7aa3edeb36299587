"""MoE gating/dispatch semantics + MoE-LLaMA integration + EP sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import LlamaConfig, MoeConfig
from medplib_tpu.models import llama, moe_llama
from medplib_tpu.ops import moe as moe_ops


def _loop_top1_reference(logits, capacity):
    """Straight-line reimplementation of DeepSpeed top1gating semantics for
    the test: greedy per-token assignment in token order, drop on overflow,
    combine weight = raw softmax prob."""
    s, e = logits.shape
    gates = np.exp(logits - logits.max(-1, keepdims=True))
    gates = gates / gates.sum(-1, keepdims=True)
    counts = np.zeros(e, int)
    out = np.zeros((s, e, capacity), np.float32)
    for t in range(s):
        ex = int(gates[t].argmax())
        if counts[ex] < capacity:
            out[t, ex, counts[ex]] = gates[t, ex]
        counts[ex] += 1
    return out


def test_top1_gate_matches_loop_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(17, 4)).astype(np.float32)
    cap = 3
    g = moe_ops.top1_gate(jnp.asarray(logits), cap)
    want = _loop_top1_reference(logits, cap)
    np.testing.assert_allclose(np.asarray(g.combine), want, rtol=1e-5,
                               atol=1e-6)
    # aux loss for perfectly balanced assignment ~ 1.0
    balanced = np.tile(np.eye(4, dtype=np.float32) * 10, (5, 1))[:16]
    g2 = moe_ops.top1_gate(jnp.asarray(balanced), 100)
    np.testing.assert_allclose(float(g2.aux_loss), 1.0, atol=0.05)


def test_top2_gate_normalized_weights():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 4)).astype(np.float32)
    g = moe_ops.top2_gate(jnp.asarray(logits), 8)
    w = np.asarray(g.combine).sum(axis=(1, 2))
    np.testing.assert_allclose(w, np.ones(8), rtol=1e-5)  # g1+g2 normalized
    # exactly two slots per token
    assert (np.asarray(g.dispatch).sum(axis=(1, 2)) == 2).all()


def test_single_expert_moe_equals_dense():
    """E=1 top-1 with ample capacity: softmax prob = 1 -> exact dense MLP."""
    cfg = LlamaConfig.tiny()
    rng = np.random.default_rng(2)
    h, m = cfg.hidden_size, cfg.intermediate_size
    x = jnp.asarray(rng.normal(size=(2, 5, h)).astype(np.float32))
    gate_k = rng.normal(size=(h, m)).astype(np.float32) * 0.1
    up_k = rng.normal(size=(h, m)).astype(np.float32) * 0.1
    down_k = rng.normal(size=(m, h)).astype(np.float32) * 0.1
    moe_params = {
        "router": {"kernel": jnp.zeros((h, 1))},
        "experts": {
            "gate_proj": {"kernel": jnp.asarray(gate_k)[None]},
            "up_proj": {"kernel": jnp.asarray(up_k)[None]},
            "down_proj": {"kernel": jnp.asarray(down_k)[None]},
        },
    }
    mcfg = MoeConfig(enable=True, num_experts=1, top_k=1, capacity_factor=2.0)
    got, aux = moe_ops.moe_mlp(moe_params, x, mcfg)
    dense_params = {"gate_proj": {"kernel": jnp.asarray(gate_k)},
                    "up_proj": {"kernel": jnp.asarray(up_k)},
                    "down_proj": {"kernel": jnp.asarray(down_k)}}
    want = llama.dense_mlp(dense_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_capacity_drop_zeroes_overflow_tokens():
    """All tokens route to expert 0; overflow tokens must output 0."""
    h = 8
    s = 6
    x = jnp.ones((1, s, h))
    moe_params = {
        "router": {"kernel": jnp.asarray(
            np.stack([np.ones(h), -np.ones(h)], axis=1))},  # all -> expert 0
        "experts": {
            "gate_proj": {"kernel": jnp.ones((2, h, h))},
            "up_proj": {"kernel": jnp.ones((2, h, h))},
            "down_proj": {"kernel": jnp.ones((2, h, h))},
        },
    }
    mcfg = MoeConfig(enable=True, num_experts=2, top_k=1, capacity_factor=1.0,
                     min_capacity=0)
    got, _ = moe_ops.moe_mlp(moe_params, x, mcfg)
    out = np.asarray(got)[0]
    # capacity = ceil(6/2*1.0) = 3 -> tokens 3..5 dropped (zero output)
    assert np.abs(out[:3]).sum() > 0
    np.testing.assert_array_equal(out[3:], 0.0)


@pytest.mark.slow
def test_moe_llama_forward_and_decode_consistency():
    cfg = LlamaConfig.tiny()
    mcfg = MoeConfig(enable=True, num_experts=2, top_k=1, capacity_factor=4.0,
                     eval_capacity_factor=4.0, moe_mode="dense")
    params = moe_llama.init_moe_llama(jax.random.PRNGKey(0), cfg, mcfg)
    rng = np.random.default_rng(3)
    B, T, MAX = 2, 6, 12
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)))
    embeds = llama.embed(params, ids)
    full, _, aux = moe_llama.forward(params, cfg, mcfg, embeds, train=False)
    assert np.isfinite(float(aux))

    cache = llama.KVCache.init(cfg, B, MAX, dtype=jnp.float32)
    _, cache, _ = moe_llama.forward(params, cfg, mcfg, embeds[:, :-1],
                                    cache=cache, train=False)
    step, _ = moe_llama.forward_decode(params, cfg, mcfg, embeds[:, -1:],
                                       cache)
    # decode-path capacity differs from prefill (fewer tokens), but with
    # ample capacity_factor no token drops -> outputs must match
    np.testing.assert_allclose(np.asarray(step), np.asarray(full[:, -1:]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_moe_partial_mode_uses_dense_elsewhere():
    cfg = LlamaConfig.tiny()
    mcfg = MoeConfig(enable=True, num_experts=2, top_k=1,
                     moe_mode="second_half", capacity_factor=4.0)
    assert mcfg.layer_indices(cfg.num_layers) == (1,)
    params = moe_llama.init_moe_llama(jax.random.PRNGKey(1), cfg, mcfg)
    embeds = llama.embed(params, jnp.arange(8).reshape(1, 8) % cfg.vocab_size)
    h, _, aux = moe_llama.forward(params, cfg, mcfg, embeds, train=True)
    assert np.isfinite(np.asarray(h)).all()


@pytest.mark.slow
def test_moe_ep_sharding_matches_unsharded():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from medplib_tpu.config import MeshConfig
    from medplib_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=1, expert=8, model=1))
    h, m, e = 16, 32, 8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, h)).astype(np.float32))
    moe_params = {
        "router": {"kernel": jnp.asarray(
            rng.normal(size=(h, e)).astype(np.float32))},
        "experts": {
            "gate_proj": {"kernel": jnp.asarray(
                rng.normal(size=(e, h, m)).astype(np.float32) * 0.1)},
            "up_proj": {"kernel": jnp.asarray(
                rng.normal(size=(e, h, m)).astype(np.float32) * 0.1)},
            "down_proj": {"kernel": jnp.asarray(
                rng.normal(size=(e, m, h)).astype(np.float32) * 0.1)},
        },
    }
    mcfg = MoeConfig(enable=True, num_experts=e, top_k=1, capacity_factor=8.0)
    want, aux_w = moe_ops.moe_mlp(moe_params, x, mcfg)

    shardings = jax.tree_util.tree_map(
        lambda a: NamedSharding(mesh, P("expert") if a.ndim == 3 else P()),
        moe_params)
    sharded_params = jax.device_put(moe_params, shardings)
    with jax.set_mesh(mesh):
        got, aux_g = jax.jit(
            lambda p, x: moe_ops.moe_mlp(p, x, mcfg, ep_shard=True)
        )(sharded_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(aux_g), float(aux_w), rtol=1e-5)


def test_residual_moe_matches_reference_mix():
    """use_residual (deepspeed MoE(use_residual=True),
    medplib_moe_llama.py:613): output = moe_out * coef[...,0] +
    dense_mlp(x) * coef[...,1] with coef = softmax(Linear(x)) — verified
    against a straight-line recomputation from the same weights."""
    rng = np.random.default_rng(7)
    h, m, e = 16, 32, 2
    x = jnp.asarray(rng.normal(size=(2, 5, h)).astype(np.float32))

    def lin(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)

    base_params = {
        "router": {"kernel": lin((h, e))},
        "experts": {
            "gate_proj": {"kernel": lin((e, h, m))},
            "up_proj": {"kernel": lin((e, h, m))},
            "down_proj": {"kernel": lin((e, m, h))},
        },
    }
    res_params = dict(base_params)
    res_params["residual_mlp"] = {
        "gate_proj": {"kernel": lin((h, m))},
        "up_proj": {"kernel": lin((h, m))},
        "down_proj": {"kernel": lin((m, h))},
    }
    res_params["coefficient"] = {"kernel": lin((h, 2)),
                                 "bias": lin((2,))}
    mcfg = MoeConfig(enable=True, num_experts=e, top_k=1,
                     capacity_factor=4.0, use_residual=True)
    got, aux = moe_ops.moe_mlp(res_params, x, mcfg)
    moe_out, aux2 = moe_ops.moe_mlp(base_params, x, mcfg)
    np.testing.assert_allclose(float(aux), float(aux2), rtol=1e-6)

    xs = np.asarray(x)
    rk = res_params["residual_mlp"]
    r1 = xs @ np.asarray(rk["gate_proj"]["kernel"])
    r2 = xs @ np.asarray(rk["up_proj"]["kernel"])
    silu = r1 / (1 + np.exp(-r1)) * r2
    dense_out = silu @ np.asarray(rk["down_proj"]["kernel"])
    logits = xs @ np.asarray(res_params["coefficient"]["kernel"]) + \
        np.asarray(res_params["coefficient"]["bias"])
    expc = np.exp(logits - logits.max(-1, keepdims=True))
    coef = expc / expc.sum(-1, keepdims=True)
    want = np.asarray(moe_out) * coef[..., 0:1] + dense_out * coef[..., 1:2]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_residual_moe_llama_end_to_end():
    """init_moe_llama(use_residual=True) creates the residual params (seeded
    from the dense MLP, like deepspeed's deepcopy) and forward/decode run;
    zeroing the coefficient makes residual weightless-neutral (softmax ->
    0.5/0.5 mix, differs from non-residual output)."""
    cfg = LlamaConfig.tiny()
    mcfg = MoeConfig(enable=True, num_experts=2, top_k=1,
                     capacity_factor=4.0, use_residual=True)
    params = moe_llama.init_moe_llama(jax.random.PRNGKey(0), cfg, mcfg)
    moe_p = params["layers"]["moe"]
    assert "residual_mlp" in moe_p and "coefficient" in moe_p
    np.testing.assert_allclose(
        np.asarray(moe_p["residual_mlp"]["gate_proj"]["kernel"]),
        np.asarray(params["layers"]["mlp"]["gate_proj"]["kernel"]))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, cfg.hidden_size))
                    .astype(np.float32))
    hidden, _, aux = moe_llama.forward(params, cfg, mcfg, x, train=False)
    assert np.isfinite(np.asarray(hidden)).all()

    # without the residual params the output must differ (the mix is real)
    import copy
    plain = copy.copy(params)
    plain["layers"] = dict(params["layers"])
    plain["layers"]["moe"] = {k: v for k, v in moe_p.items()
                              if k in ("router", "experts")}
    hidden2, _, _ = moe_llama.forward(plain, cfg, mcfg, x, train=False)
    assert not np.allclose(np.asarray(hidden), np.asarray(hidden2))


@pytest.mark.slow
def test_moe_from_hf_residual_translation():
    """moe_llama_from_hf picks up deepspeed residual keys
    (layers.{i}.mlp.mlp.* and layers.{i}.mlp.coefficient.*)."""
    from medplib_tpu.utils.hf_weights import moe_llama_from_hf
    cfg = LlamaConfig.tiny()
    rng = np.random.default_rng(1)
    h, m, e, L = (cfg.hidden_size, cfg.intermediate_size, 2, cfg.num_layers)
    sd = {}
    sd["model.embed_tokens.weight"] = rng.normal(
        size=(cfg.vocab_size, h)).astype(np.float32)
    sd["model.norm.weight"] = np.ones(h, np.float32)
    sd["lm_head.weight"] = rng.normal(size=(cfg.vocab_size, h)
                                      ).astype(np.float32)
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        for n, shape in (("q_proj", (h, h)), ("k_proj", (h, h)),
                         ("v_proj", (h, h)), ("o_proj", (h, h))):
            sd[p + f"self_attn.{n}.weight"] = rng.normal(
                size=shape).astype(np.float32)
        sd[p + "mlp.deepspeed_moe.gate.wg.weight"] = rng.normal(
            size=(e, h)).astype(np.float32)
        for ex in range(e):
            for n, shape in (("gate_proj", (m, h)), ("up_proj", (m, h)),
                             ("down_proj", (h, m))):
                sd[p + f"mlp.deepspeed_moe.experts.deepspeed_experts."
                       f"{ex}.{n}.weight"] = rng.normal(
                    size=shape).astype(np.float32)
        for n, shape in (("gate_proj", (m, h)), ("up_proj", (m, h)),
                         ("down_proj", (h, m))):
            sd[p + f"mlp.mlp.{n}.weight"] = rng.normal(
                size=shape).astype(np.float32)
        sd[p + "mlp.coefficient.weight"] = rng.normal(
            size=(2, h)).astype(np.float32)
        sd[p + "mlp.coefficient.bias"] = rng.normal(size=(2,)
                                                    ).astype(np.float32)
    tree = moe_llama_from_hf(sd, cfg, moe_layer_indices=range(L),
                             num_experts=e)
    moe_p = tree["layers"]["moe"]
    assert moe_p["residual_mlp"]["gate_proj"]["kernel"].shape == (L, h, m)
    assert moe_p["coefficient"]["kernel"].shape == (L, h, 2)
    np.testing.assert_allclose(
        moe_p["coefficient"]["kernel"][0],
        sd["model.layers.0.mlp.coefficient.weight"].T)
    np.testing.assert_allclose(
        moe_p["residual_mlp"]["down_proj"]["kernel"][1],
        sd["model.layers.1.mlp.mlp.down_proj.weight"].T)
    # forward runs with the translated tree
    mcfg = MoeConfig(enable=True, num_experts=e, top_k=1,
                     capacity_factor=4.0, use_residual=True)
    x = jnp.asarray(rng.normal(size=(1, 4, h)).astype(np.float32))
    hidden, _, _ = moe_llama.forward(tree, cfg, mcfg, x, train=False)
    assert np.isfinite(np.asarray(hidden)).all()


@pytest.mark.slow
def test_ragged_dispatch_matches_sort_when_zero_drop():
    """dispatch_mode='ragged' (jax.lax.ragged_dot grouped matmul) is
    exact-equivalent to the capacity dispatch when capacity >= S: top-1,
    eval cf 2.0, E=2 — the shipped inference config. 'auto' picks it."""
    from medplib_tpu.config import MoeConfig
    from medplib_tpu.ops.moe import moe_mlp
    rng = jax.random.PRNGKey(11)
    E, H, M, B, T = 2, 32, 64, 2, 8
    ks = jax.random.split(rng, 4)
    mp = {
        "router": {"kernel": jax.random.normal(ks[0], (H, E)) * H ** -0.5},
        "experts": {
            "gate_proj": {"kernel": jax.random.normal(ks[1], (E, H, M))
                          * H ** -0.5},
            "up_proj": {"kernel": jax.random.normal(ks[2], (E, H, M))
                        * H ** -0.5},
            "down_proj": {"kernel": jax.random.normal(ks[3], (E, M, H))
                          * M ** -0.5},
        },
    }
    x = jax.random.normal(jax.random.fold_in(rng, 5), (B, T, H))
    mcfg = MoeConfig(enable=True, num_experts=E, top_k=1,
                     capacity_factor=1.5, eval_capacity_factor=2.0)
    y_sort, aux_sort = moe_mlp(mp, x, mcfg, train=False,
                               dispatch_mode="sort")
    y_rag, aux_rag = moe_mlp(mp, x, mcfg, train=False,
                             dispatch_mode="ragged")
    y_auto, _ = moe_mlp(mp, x, mcfg, train=False)  # auto -> ragged
    np.testing.assert_allclose(np.asarray(y_rag), np.asarray(y_sort),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_rag),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(aux_rag), float(aux_sort), rtol=1e-6)

    # training (capacity can drop) must NOT auto-switch: cf 0.5 drops
    # tokens, sort and ragged then legitimately differ
    mcfg2 = MoeConfig(enable=True, num_experts=E, top_k=1,
                      capacity_factor=0.5, eval_capacity_factor=0.5)
    y_tr, _ = moe_mlp(mp, x, mcfg2, train=True)
    y_tr_sort, _ = moe_mlp(mp, x, mcfg2, train=True, dispatch_mode="sort")
    np.testing.assert_allclose(np.asarray(y_tr), np.asarray(y_tr_sort),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_ragged_dispatch_int4h_experts():
    """ragged + int4h experts (the flagship combination) stays close to
    the fp32 sort dispatch."""
    from medplib_tpu.config import MoeConfig
    from medplib_tpu.ops.moe import moe_mlp
    from medplib_tpu.utils.quantize import quantize_tree
    rng = jax.random.PRNGKey(13)
    E, H, M, B, T = 2, 32, 64, 2, 8
    ks = jax.random.split(rng, 4)
    mp = {
        "router": {"kernel": jax.random.normal(ks[0], (H, E)) * H ** -0.5},
        "experts": {
            "gate_proj": {"kernel": jax.random.normal(ks[1], (E, H, M))
                          * H ** -0.5},
            "up_proj": {"kernel": jax.random.normal(ks[2], (E, H, M))
                        * H ** -0.5},
            "down_proj": {"kernel": jax.random.normal(ks[3], (E, M, H))
                          * M ** -0.5},
        },
    }
    x = jax.random.normal(jax.random.fold_in(rng, 7), (B, T, H))
    mcfg = MoeConfig(enable=True, num_experts=E, top_k=1,
                     eval_capacity_factor=2.0)
    y_fp, _ = moe_mlp(mp, x, mcfg, train=False, dispatch_mode="sort")
    mq = quantize_tree(jax.tree_util.tree_map(lambda a: a, mp), bits=4)
    y_q, _ = moe_mlp(mq, x, mcfg, train=False, dispatch_mode="ragged")
    rel = float(jnp.linalg.norm(y_q - y_fp) / (jnp.linalg.norm(y_fp) + 1e-9))
    assert rel < 0.2, rel


@pytest.mark.slow
def test_gmm_dispatch_matches_sort_when_zero_drop():
    """dispatch_mode='gmm' (Pallas grouped matmul over group-aligned
    tiles, ops/pallas/gmm.py) == capacity dispatch in the zero-drop
    regime; 'auto' picks it at prefill-sized S; int8 experts dequantize
    at the kernel epilogue."""
    from medplib_tpu.config import MoeConfig
    from medplib_tpu.ops.moe import moe_mlp
    from medplib_tpu.utils.quantize import quantize_tree
    rng = jax.random.PRNGKey(17)
    E, H, M, B, T = 2, 128, 256, 8, 160  # S=1280 >= the gmm threshold
    ks = jax.random.split(rng, 4)
    mp = {
        "router": {"kernel": jax.random.normal(ks[0], (H, E)) * H ** -0.5},
        "experts": {
            "gate_proj": {"kernel": jax.random.normal(ks[1], (E, H, M))
                          * H ** -0.5},
            "up_proj": {"kernel": jax.random.normal(ks[2], (E, H, M))
                        * H ** -0.5},
            "down_proj": {"kernel": jax.random.normal(ks[3], (E, M, H))
                          * M ** -0.5},
        },
    }
    x = jax.random.normal(jax.random.fold_in(rng, 5), (B, T, H))
    mcfg = MoeConfig(enable=True, num_experts=E, top_k=1,
                     eval_capacity_factor=2.0)
    y_sort, aux_s = moe_mlp(mp, x, mcfg, train=False, dispatch_mode="sort")
    y_gmm, aux_g = moe_mlp(mp, x, mcfg, train=False, dispatch_mode="gmm")
    y_auto, _ = jax.jit(
        lambda m, v: moe_mlp(m, v, mcfg, train=False))(mp, x)
    np.testing.assert_allclose(np.asarray(y_gmm), np.asarray(y_sort),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_gmm),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(aux_g), float(aux_s), rtol=1e-6)

    # int8 experts: native int8 operand + epilogue scale inside the kernel
    mq = quantize_tree(jax.tree_util.tree_map(lambda a: a, mp), bits=8)
    assert mq["experts"]["gate_proj"]["kernel"].dtype == jnp.int8
    y_q8, _ = moe_mlp(mq, x, mcfg, train=False, dispatch_mode="gmm")
    rel = float(jnp.linalg.norm(y_q8 - y_sort) /
                (jnp.linalg.norm(y_sort) + 1e-9))
    assert rel < 0.05, rel


@pytest.mark.slow
def test_gmm_w8a8_dispatch():
    """Fused W8A8 gmm (int8 activations + int8 experts, int32 VMEM
    accumulation): engages only under dynamic_act_quant, stays within
    double-quantization tolerance of the fp32 sort dispatch."""
    from medplib_tpu.config import MoeConfig
    from medplib_tpu.ops.moe import moe_mlp
    from medplib_tpu.utils.quantize import dynamic_act_quant, quantize_tree
    rng = jax.random.PRNGKey(23)
    E, H, M, B, T = 2, 128, 256, 8, 160
    ks = jax.random.split(rng, 4)
    mp = {
        "router": {"kernel": jax.random.normal(ks[0], (H, E)) * H ** -0.5},
        "experts": {
            "gate_proj": {"kernel": jax.random.normal(ks[1], (E, H, M))
                          * H ** -0.5},
            "up_proj": {"kernel": jax.random.normal(ks[2], (E, H, M))
                        * H ** -0.5},
            "down_proj": {"kernel": jax.random.normal(ks[3], (E, M, H))
                          * M ** -0.5},
        },
    }
    x = jax.random.normal(jax.random.fold_in(rng, 5), (B, T, H))
    mcfg = MoeConfig(enable=True, num_experts=E, top_k=1,
                     eval_capacity_factor=2.0)
    y_ref, _ = moe_mlp(mp, x, mcfg, train=False, dispatch_mode="sort")
    mq = quantize_tree(jax.tree_util.tree_map(lambda a: a, mp), bits=8)
    with dynamic_act_quant(True):
        y_w, _ = jax.jit(lambda m, v: moe_mlp(
            m, v, mcfg, train=False, dispatch_mode="gmm"))(mq, x)
    rel = float(jnp.linalg.norm(y_w - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.05, rel


@pytest.mark.slow
def test_gmm_int4h_kernel_matches_dequant():
    """gmm_int4h (in-register nibble unpack, per-half scales) == the
    materializing dequant matmul, per expert tile — incl. a K/2 whose only
    lane-aligned block is 128 (the down_proj 5504 = 43x128 analog) and a
    K/2 > 2048 that forces a multi-block accumulate loop."""
    from medplib_tpu.ops.pallas.gmm import gmm_int4h
    from medplib_tpu.utils.quantize import _quantize_kernel4h, dequant_int4h

    for K, N in ((512, 256), (768, 128), (4608, 128)):
        rng = jax.random.PRNGKey(K)
        E = 2
        w = jax.random.normal(rng, (E, K, N)) * K ** -0.5
        packed, scale = _quantize_kernel4h(w, False, 2)
        assert packed.shape == (E, K // 2, N)
        assert scale.shape == (E, 2, 1, N)
        x = jax.random.normal(jax.random.fold_in(rng, 1), (256, K),
                              jnp.float32)
        tile_gid = jnp.asarray([0, 1], jnp.int32)  # tile 0 -> e0, 1 -> e1
        got = gmm_int4h(x, packed, scale, tile_gid, block_m=128,
                        block_n=128)
        wd = dequant_int4h(packed, scale, jnp.float32)
        want = jnp.concatenate([x[:128] @ wd[0], x[128:] @ wd[1]])
        # the kernel dots in bf16 (the MXU input dtype); nibbles are exact
        # in bf16 so the only error is activation rounding
        rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
        assert rel < 2e-3, (K, N, rel)
        assert float(jnp.max(jnp.abs(got - want))) < 0.05, (K, N)


@pytest.mark.slow
def test_gmm_int4h_w4a8_kernel():
    """W4A8 gmm_int4h: int8 activations x unpacked int4 nibbles, int32
    VMEM accumulation, (row x half x channel) rescale at the epilogue."""
    from medplib_tpu.ops.pallas.gmm import gmm_int4h, quantize_rows
    from medplib_tpu.utils.quantize import _quantize_kernel4h, dequant_int4h

    rng = jax.random.PRNGKey(3)
    E, K, N = 2, 768, 256
    w = jax.random.normal(rng, (E, K, N)) * K ** -0.5
    packed, scale = _quantize_kernel4h(w, False, 2)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (256, K), jnp.float32)
    xq, xsc = quantize_rows(x)
    tile_gid = jnp.asarray([0, 1], jnp.int32)
    got = gmm_int4h(xq, packed, scale, tile_gid, a_scale=xsc, block_m=128,
                    block_n=128)
    wd = dequant_int4h(packed, scale, jnp.float32)
    want = jnp.concatenate([x[:128] @ wd[0], x[128:] @ wd[1]])
    rel = float(jnp.linalg.norm(got.astype(jnp.float32) - want)
                / jnp.linalg.norm(want))
    assert rel < 0.02, rel  # activation-quant noise only


@pytest.mark.slow
def test_gmm_int4h_dispatch():
    """dispatch_mode='gmm' routes per-half int4h experts (the
    quantize_flagship_moe layout) through the in-kernel nibble path — and
    stays close to the fp32 sort dispatch, with and without W4A8."""
    from medplib_tpu.config import MoeConfig
    from medplib_tpu.ops.moe import moe_mlp
    from medplib_tpu.utils.quantize import dynamic_act_quant, quantize_tree
    rng = jax.random.PRNGKey(29)
    E, H, M, B, T = 2, 256, 384, 8, 160
    ks = jax.random.split(rng, 4)
    mp = {
        "router": {"kernel": jax.random.normal(ks[0], (H, E)) * H ** -0.5},
        "experts": {
            "gate_proj": {"kernel": jax.random.normal(ks[1], (E, H, M))
                          * H ** -0.5},
            "up_proj": {"kernel": jax.random.normal(ks[2], (E, H, M))
                        * H ** -0.5},
            "down_proj": {"kernel": jax.random.normal(ks[3], (E, M, H))
                          * M ** -0.5},
        },
    }
    x = jax.random.normal(jax.random.fold_in(rng, 5), (B, T, H))
    mcfg = MoeConfig(enable=True, num_experts=E, top_k=1,
                     eval_capacity_factor=2.0)
    y_ref, _ = moe_mlp(mp, x, mcfg, train=False, dispatch_mode="sort")
    mq = quantize_tree(jax.tree_util.tree_map(lambda a: a, mp), bits=4,
                       int4_groups=2)
    assert mq["experts"]["gate_proj"]["scale4h"].shape[-3] == 2
    y_q, _ = moe_mlp(mq, x, mcfg, train=False, dispatch_mode="gmm")
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.25, rel  # int4 per-half quant error at tiny dims
    # the same tree through the (exact) sort dispatch pins down the kernel:
    # gmm vs sort on IDENTICAL int4 weights must agree to bf16-dot
    # tolerance (the sort path dots in f32, the kernel in bf16)
    y_q_sort, _ = moe_mlp(mq, x, mcfg, train=False, dispatch_mode="sort")
    rel_k = float(jnp.linalg.norm(y_q - y_q_sort)
                  / jnp.linalg.norm(y_q_sort))
    assert rel_k < 5e-3, rel_k
    assert float(jnp.max(jnp.abs(y_q - y_q_sort))) < 0.05
    with dynamic_act_quant(True):
        y_w, _ = jax.jit(lambda m, v: moe_mlp(
            m, v, mcfg, train=False, dispatch_mode="gmm"))(mq, x)
    rel_w = float(jnp.linalg.norm(y_w - y_q_sort) /
                  jnp.linalg.norm(y_q_sort))
    assert rel_w < 0.05, rel_w


@pytest.mark.parametrize("pattern", ["all_one", "tight", "empty_first",
                                     "alternating"])
def test_align_groups_adversarial_routing(pattern):
    """align_groups under routing skew: every adversarial distribution
    must scatter without collisions, keep dest in-bounds, and give each
    real token's m-tile its own expert id. E = 2 uses the TWO-ENDED
    layout (group 1 descending from the buffer end, one block_m of gap:
    sp = ceil(S/bm)*bm + bm); the gap guarantees no tile touches both
    groups even at the adversarial splits."""
    from medplib_tpu.ops.pallas.gmm import align_groups
    E, bm, K = 2, 32, 8
    S = 162 if pattern == "tight" else 161
    if pattern == "all_one":
        idx = np.full((S,), 1, np.int32)          # one expert takes all
    elif pattern == "tight":
        # sizes 65 / 97, both == 1 (mod bm): total padding 2*bm - 2 and
        # the aligned buffer fills sp EXACTLY (the bound's equality case)
        idx = np.zeros((S,), np.int32)
        idx[:65] = 1
        np.random.default_rng(1).shuffle(idx)
    elif pattern == "empty_first":
        # expert 0 gets only the LAST token: its group (first in the
        # aligned buffer) is a single row in an otherwise empty tile,
        # and expert 1's 160-token run starts at the next tile boundary
        idx = np.full((S,), 1, np.int32)
        idx[-1] = 0
    else:
        idx = (np.arange(S) % E).astype(np.int32)
    xs = np.random.default_rng(0).normal(size=(S, K)).astype(np.float32)
    x_al, dest, tile_gid = jax.jit(
        lambda v, i: align_groups(v, i, E, bm))(jnp.asarray(xs),
                                                jnp.asarray(idx))
    x_al, dest, tile_gid = map(np.asarray, (x_al, dest, tile_gid))
    sp = ((S + bm - 1) // bm + 1) * bm   # two-ended E=2 layout
    assert x_al.shape == (sp, K) and tile_gid.shape == (sp // bm,)
    # no collisions, all rows in-bounds
    assert len(set(dest.tolist())) == S
    assert dest.min() >= 0 and dest.max() < sp
    # scatter round-trips: gathering dest rows recovers the tokens
    np.testing.assert_allclose(x_al[dest], xs, rtol=0, atol=0)
    # non-token rows stay zero (gap + tail padding)
    mask = np.ones(sp, bool)
    mask[dest] = False
    assert np.all(x_al[mask] == 0.0)
    # each real token's tile is labeled with ITS expert
    np.testing.assert_array_equal(tile_gid[dest // bm], idx)


def _stacked_test_tree(key, L, E, H, M, dtype=jnp.float32):
    """MoE-llama param tree at whole-stack-gmm-eligible shapes."""
    cfg = LlamaConfig(num_layers=L, hidden_size=H, intermediate_size=M,
                      num_heads=8, num_kv_heads=8, vocab_size=128,
                      max_position_embeddings=512)
    mcfg = MoeConfig(enable=True, num_experts=E, top_k=1,
                     eval_capacity_factor=2.0, moe_mode="dense")
    params = moe_llama.init_moe_llama(key, cfg, mcfg, dtype)
    params = moe_llama.strip_dense_mlp(params, cfg, mcfg)
    return cfg, mcfg, params


def _assert_close_modulo_router_ties(a, b, frac=0.005, rel_norm=0.01):
    """Equivalence check for two differently-FUSED compilations of the
    same MoE math (stacked vs sliced, gmm vs sort) in a MULTI-layer
    forward: a 1-ULP difference in layer l's output can flip layer l+1's
    top-1 decision for tokens near a routing tie (~1-2% of random-init
    tokens), making whole token rows differ while both outcomes are valid.
    Accepts bit-inequality only of that shape: a tiny fraction of
    elements may differ and the global relative norm must stay tiny —
    a real dispatch bug (wrong expert, wrong scale, wrong rows) moves
    far more than 0.5% of elements."""
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    bad = np.abs(a - b) > 2e-3 + 2e-3 * np.abs(b)
    assert bad.mean() <= frac, f"{bad.mean():.4%} elements differ"
    rel = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9))
    assert rel < rel_norm, rel


@pytest.mark.slow
def test_stacked_gmm_forward_matches_sliced():
    """The whole-stack layer-indexed gmm path (stack_experts_for_gmm +
    gid_offset) computes the same forward as the per-layer-sliced gmm and
    the sort dispatch — for int8 and int4h(G=2) expert trees — and
    engages automatically at eligible shapes."""
    from medplib_tpu.utils.quantize import quantize_tree
    # H/M chosen so _pick_bk needs no padding and M % 512 == 0
    L, E, H, M, B, T = 2, 2, 1024, 1536, 4, 256  # S = 1024
    cfg, mcfg, params = _stacked_test_tree(jax.random.PRNGKey(3), L, E, H, M)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, H)) * 0.1

    for bits, kw in ((8, {}), (4, {"int4_groups": 2})):
        p = jax.tree_util.tree_map(lambda a: a, params)
        p["layers"]["moe"]["experts"] = quantize_tree(
            p["layers"]["moe"]["experts"], skip=(), bits=bits, **kw)
        st = moe_llama.stack_experts_for_gmm(
            p["layers"]["moe"]["experts"], mcfg, B * T, train=False,
            ep_shard=False)
        assert st is not None, f"bits={bits} should be stack-eligible"
        assert st["gate_proj"]["kernel"].shape[0] == L * E

        y_stacked, _, aux_st = moe_llama.forward(
            p, cfg, mcfg, x, train=False)
        y_sliced, _, aux_sl = moe_llama.forward(
            p, cfg, mcfg, x, train=False, use_stacked_gmm=False)
        _assert_close_modulo_router_ties(y_stacked, y_sliced)
        np.testing.assert_allclose(float(aux_st), float(aux_sl), rtol=1e-4)

    # ineligible shapes fall back: S below the gmm threshold
    st = moe_llama.stack_experts_for_gmm(
        params["layers"]["moe"]["experts"], mcfg, 64, train=False,
        ep_shard=False)
    assert st is None
    # float kernels (no quantization) are not whole-stack-eligible
    st = moe_llama.stack_experts_for_gmm(
        params["layers"]["moe"]["experts"], mcfg, B * T, train=False,
        ep_shard=False)
    assert st is None


@pytest.mark.slow
def test_pad_moe_experts_for_gmm_exact():
    """M-padding (utils/quantize.pad_moe_experts_for_gmm) is invisible:
    every dispatch computes identical outputs on the padded tree, and the
    padded int8 tree becomes whole-stack eligible."""
    from medplib_tpu.ops.moe import moe_mlp
    from medplib_tpu.utils.quantize import (pad_moe_experts_for_gmm,
                                            quantize_tree)
    rng = jax.random.PRNGKey(11)
    E, H, M, B, T = 2, 64, 96, 4, 8
    ks = jax.random.split(rng, 4)
    mp = {
        "router": {"kernel": jax.random.normal(ks[0], (H, E)) * H ** -0.5},
        "experts": {
            "gate_proj": {"kernel": jax.random.normal(ks[1], (E, H, M))
                          * H ** -0.5},
            "up_proj": {"kernel": jax.random.normal(ks[2], (E, H, M))
                        * H ** -0.5},
            "down_proj": {"kernel": jax.random.normal(ks[3], (E, M, H))
                          * M ** -0.5},
        },
    }
    x = jax.random.normal(jax.random.fold_in(rng, 5), (B, T, H))
    mcfg = MoeConfig(enable=True, num_experts=E, top_k=1,
                     eval_capacity_factor=2.0)
    y_ref, aux_ref = moe_mlp(mp, x, mcfg, train=False, dispatch_mode="sort")

    padded = jax.tree_util.tree_map(lambda a: a, mp)
    padded["experts"] = pad_moe_experts_for_gmm(padded["experts"], align=128)
    g = padded["experts"]["gate_proj"]["kernel"]
    assert g.shape[-1] == 128 and g.shape[:-1] == (E, H)
    assert padded["experts"]["down_proj"]["kernel"].shape == (E, 128, H)
    y_pad, aux_pad = moe_mlp(padded, x, mcfg, train=False,
                             dispatch_mode="sort")
    np.testing.assert_allclose(np.asarray(y_pad), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(aux_pad), float(aux_ref), rtol=1e-6)

    # einsum dispatch agrees too
    y_ein, _ = moe_mlp(padded, x, mcfg, train=False, dispatch_mode="einsum")
    np.testing.assert_allclose(np.asarray(y_ein), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)

    # quantization after padding refuses nothing; padding after
    # quantization is a bug and asserts
    quantize_tree(padded["experts"], skip=(), bits=8)
    try:
        pad_moe_experts_for_gmm(padded["experts"], align=256)
        raise AssertionError("expected assert on post-quant padding")
    except AssertionError as e:
        assert "before quantization" in str(e)


@pytest.mark.slow
def test_decode_gmm_matches_sort(monkeypatch):
    """MEDPLIB_DECODE_GMM=1 routes the decode-step expert MLP through the
    whole-stack gmm at block_m=32 (models/moe_llama.forward_decode); output
    must match the default capacity-sort decode for int8 and int4h trees."""
    from medplib_tpu.utils.quantize import quantize_tree
    L, E, H, M, B, T, MAX = 2, 2, 1024, 1536, 4, 5, 8
    cfg, mcfg, params = _stacked_test_tree(jax.random.PRNGKey(7), L, E, H, M)
    rng = np.random.default_rng(9)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)))

    for bits, kw in ((8, {}), (4, {"int4_groups": 2})):
        p = jax.tree_util.tree_map(lambda a: a, params)
        p["layers"]["moe"]["experts"] = quantize_tree(
            p["layers"]["moe"]["experts"], skip=(), bits=bits, **kw)
        embeds = llama.embed(p, ids)

        def decode_last(pp):
            cache = llama.KVCache.init(cfg, B, MAX, dtype=jnp.float32)
            _, cache, _ = moe_llama.forward(pp, cfg, mcfg, embeds[:, :-1],
                                            cache=cache, train=False)
            step, _ = moe_llama.forward_decode(pp, cfg, mcfg,
                                               embeds[:, -1:], cache)
            return np.asarray(step)

        monkeypatch.setenv("MEDPLIB_DECODE_GMM", "0")  # force sort (int4h
        # trees default to the gmm decode path)
        y_sort = decode_last(p)
        monkeypatch.setenv("MEDPLIB_DECODE_GMM", "1")
        # the stack must actually engage at decode shapes
        st = moe_llama.stack_experts_for_gmm(
            p["layers"]["moe"]["experts"], mcfg, B, train=False,
            ep_shard=False, decode=True)
        assert st is not None, f"bits={bits} decode stack should engage"
        y_gmm = decode_last(p)
        # gmm dots int8 operands in bf16 (in-kernel epilogue dequant);
        # sort dequantizes first and dots in f32 — same rel-norm bound as
        # test_gmm_dispatch_matches_sort_when_zero_drop's int8 leg
        rel = float(np.linalg.norm(y_gmm - y_sort)
                    / (np.linalg.norm(y_sort) + 1e-9))
        assert rel < 0.05, (bits, rel)
    monkeypatch.delenv("MEDPLIB_DECODE_GMM", raising=False)


@pytest.mark.slow
def test_ep_gmm_matches_single_device():
    """Expert-PARALLEL whole-stack gmm (ops/moe._gmm_moe_ep): on a
    (data=2, expert=2, model=2) mesh with the expert stacks sharded on
    the expert axis, forward with ep_shard=True must engage the EP gmm
    (unreshaped [L, E, ...] stack view) and match the single-device
    stacked-gmm forward — int8 prefill and int4h decode."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from medplib_tpu.config import MeshConfig
    from medplib_tpu.parallel.mesh import make_mesh, param_sharding
    from medplib_tpu.utils.quantize import quantize_tree

    L, E, H, M, B, T = 2, 2, 1024, 1536, 8, 128
    cfg, mcfg, params = _stacked_test_tree(jax.random.PRNGKey(3), L, E, H, M)
    params["layers"]["moe"]["experts"] = quantize_tree(
        params["layers"]["moe"]["experts"], skip=(), bits=8)
    x = jax.random.normal(jax.random.PRNGKey(4), (B, T, H)) * 0.1

    y_ref, _, aux_ref = jax.jit(
        lambda p, v: moe_llama.forward(p, cfg, mcfg, v, train=False))(
            params, x)

    mesh = make_mesh(MeshConfig(data=2, expert=2, model=2))
    ps = jax.tree_util.tree_map(jax.device_put, params,
                                param_sharding(mesh, params))
    # scales must ride the expert axis with their kernels (mesh rules)
    sc_spec = param_sharding(
        mesh, params)["layers"]["moe"]["experts"]["gate_proj"]["scale"].spec
    assert sc_spec == P(None, "expert", None, None), sc_spec
    xs = jax.device_put(x, NamedSharding(mesh, P(("data", "expert"),
                                                 None, None)))
    with jax.set_mesh(mesh):
        ep, rs = moe_llama.mesh_ep_shards()
        assert (ep, rs) == (2, 4)
        st = moe_llama.stack_experts_for_gmm(
            params["layers"]["moe"]["experts"], mcfg, B * T, train=False,
            ep_shard=True, ep=ep, row_shards=rs)
        assert st is not None and st["gate_proj"]["kernel"].ndim == 4, \
            "EP stack must engage with UNRESHAPED [L, E, ...] kernels"
        y_ep, _, aux_ep = jax.jit(
            lambda p, v: moe_llama.forward(p, cfg, mcfg, v, train=False,
                                           ep_shard=True))(ps, xs)
        jax.block_until_ready(y_ep)
    _assert_close_modulo_router_ties(y_ep, y_ref)
    np.testing.assert_allclose(float(aux_ep), float(aux_ref), rtol=1e-4)

    # indivisible rows (S % (data*expert) != 0) refuse the EP stack
    assert moe_llama.stack_experts_for_gmm(
        params["layers"]["moe"]["experts"], mcfg, B * T + 2, train=False,
        ep_shard=True, ep=2, row_shards=4) is None
    # ep_shard without an expert mesh axis in scope stays conservative
    assert moe_llama.stack_experts_for_gmm(
        params["layers"]["moe"]["experts"], mcfg, B * T, train=False,
        ep_shard=True) is None


@pytest.mark.slow
def test_ep_gmm_decode_matches_single_device(monkeypatch):
    """int4h decode step under the expert-sharded mesh (the multi-chip
    serving configuration) matches the single-device decode gmm."""
    from medplib_tpu.config import MeshConfig
    from medplib_tpu.parallel.mesh import make_mesh, param_sharding
    from medplib_tpu.utils.quantize import quantize_tree

    monkeypatch.setenv("MEDPLIB_DECODE_GMM", "1")
    # pin the single-device side to the SAME 3-call gmm formulation the EP
    # shard_map runs — this test isolates sharding equivalence; the fused
    # A8 kernel (default on single shard) is covered by its own test
    monkeypatch.setenv("MEDPLIB_DECODE_FUSED", "0")
    L, E, H, M, B, T, MAX = 2, 2, 1024, 1536, 8, 5, 8
    cfg, mcfg, params = _stacked_test_tree(jax.random.PRNGKey(7), L, E, H, M)
    params["layers"]["moe"]["experts"] = quantize_tree(
        params["layers"]["moe"]["experts"], skip=(), bits=4, int4_groups=2)
    ids = jnp.asarray(np.random.default_rng(9).integers(
        0, cfg.vocab_size, size=(B, T)))
    embeds = llama.embed(params, ids)

    def decode_last(pp, ep):
        cache = llama.KVCache.init(cfg, B, MAX, dtype=jnp.float32)
        _, cache, _ = moe_llama.forward(pp, cfg, mcfg, embeds[:, :-1],
                                        cache=cache, train=False,
                                        ep_shard=ep)
        step, _ = moe_llama.forward_decode(pp, cfg, mcfg, embeds[:, -1:],
                                           cache, ep_shard=ep)
        return step

    y1 = np.asarray(jax.jit(lambda p: decode_last(p, False))(params))
    mesh = make_mesh(MeshConfig(data=2, expert=2, model=2))
    ps = jax.tree_util.tree_map(jax.device_put, params,
                                param_sharding(mesh, params))
    with jax.set_mesh(mesh):
        y2 = np.asarray(jax.jit(lambda p: decode_last(p, True))(ps))
    _assert_close_modulo_router_ties(y2, y1)


@pytest.mark.slow
def test_fused_decode_kernel_matches_gmm_and_sort(monkeypatch):
    """ops/pallas/moe_decode.moe_ffn_decode_int4h — the one-call routed
    SwiGLU decode kernel — must match the 3-call gmm decode and the
    capacity-sort dispatch on a single layer (tight bounds: same math,
    different fusion), honor the whole-stack layer gid offset, and handle
    non-16-multiple batch rows via the padding path."""
    from medplib_tpu.ops import moe as moe_ops
    from medplib_tpu.ops.pallas.moe_decode import fused_decode_eligible
    from medplib_tpu.utils.quantize import quantize_tree

    E, H, M, B = 2, 1024, 1536, 8
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 4)
    experts = {
        "gate_proj": {"kernel": jax.random.normal(ks[0], (2, E, H, M))
                      * H ** -0.5},
        "up_proj": {"kernel": jax.random.normal(ks[1], (2, E, H, M))
                    * H ** -0.5},
        "down_proj": {"kernel": jax.random.normal(ks[2], (2, E, M, H))
                      * M ** -0.5},
    }
    experts = quantize_tree(experts, skip=(), bits=4, int4_groups=2)
    mcfg = MoeConfig(enable=True, num_experts=E, top_k=1,
                     eval_capacity_factor=2.0)
    st = moe_llama.stack_experts_for_gmm(experts, mcfg, B, train=False,
                                         ep_shard=False, decode=True)
    assert st is not None and fused_decode_eligible(st, E)
    router = jax.random.normal(ks[3], (H, E)) * H ** -0.5
    x = jax.random.normal(jax.random.fold_in(key, 9), (B, 1, H)) * 0.1
    mp = {"router": {"kernel": router}, "experts": st, "gid_offset": 0,
          "gmm_block_m": 32}

    def run(v):
        return np.asarray(jax.jit(
            lambda xv: moe_ops.moe_mlp(mp, xv, mcfg, train=False,
                                       dispatch_mode="gmm")[0])(v))

    monkeypatch.setenv("MEDPLIB_DECODE_A8", "0")  # bf16-x for tight bounds
    monkeypatch.setenv("MEDPLIB_DECODE_FUSED", "0")
    y_gmm = run(x)
    monkeypatch.setenv("MEDPLIB_DECODE_FUSED", "1")
    y_f = run(x)
    # same math, different fusion: bf16 reassociation only
    assert np.abs(y_f - y_gmm).max() < 5e-4
    rel = np.linalg.norm(y_f - y_gmm) / np.linalg.norm(y_gmm)
    assert rel < 0.01, rel

    mp0 = {"router": {"kernel": router},
           "experts": {k: {kk: vv[0] for kk, vv in n.items()}
                       for k, n in experts.items()}}
    y_s = np.asarray(jax.jit(
        lambda xv: moe_ops.moe_mlp(mp0, xv, mcfg, train=False,
                                   dispatch_mode="sort")[0])(x))
    rel = np.linalg.norm(y_f - y_s) / np.linalg.norm(y_s)
    assert rel < 0.01, rel

    # layer-1 gid offset must select the second layer's experts: compare
    # against sort on layer 1
    mp1 = dict(mp, gid_offset=1 * E)
    monkeypatch.setenv("MEDPLIB_DECODE_FUSED", "1")
    y1 = np.asarray(jax.jit(
        lambda xv: moe_ops.moe_mlp(mp1, xv, mcfg, train=False,
                                   dispatch_mode="gmm")[0])(x))
    mp0b = {"router": {"kernel": router},
            "experts": {k: {kk: vv[1] for kk, vv in n.items()}
                        for k, n in experts.items()}}
    y1_s = np.asarray(jax.jit(
        lambda xv: moe_ops.moe_mlp(mp0b, xv, mcfg, train=False,
                                   dispatch_mode="sort")[0])(x))
    rel = np.linalg.norm(y1 - y1_s) / np.linalg.norm(y1_s)
    assert rel < 0.01, rel
    # layer 1 differs from layer 0 (the offset actually moved the window)
    assert np.linalg.norm(y1 - y_f) / np.linalg.norm(y_f) > 0.1

    # odd batch (row padding path): B=3
    x3 = x[:3]
    monkeypatch.setenv("MEDPLIB_DECODE_FUSED", "0")
    y3_gmm = run(x3)
    monkeypatch.setenv("MEDPLIB_DECODE_FUSED", "1")
    y3_f = run(x3)
    assert np.abs(y3_f - y3_gmm).max() < 5e-4

    # A8 mode (the serving default): s8 MXU dots with per-row/per-block
    # act quant — looser bound (A8 rounding), same routing/combine
    monkeypatch.setenv("MEDPLIB_DECODE_A8", "1")
    y_a8 = run(x)
    rel = np.linalg.norm(y_a8 - y_gmm) / np.linalg.norm(y_gmm)
    assert rel < 0.03, rel

