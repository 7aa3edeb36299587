"""MoE gating/dispatch semantics + MoE-LLaMA integration + EP sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

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


def test_moe_partial_mode_uses_dense_elsewhere():
    cfg = LlamaConfig.tiny()
    mcfg = MoeConfig(enable=True, num_experts=2, top_k=1,
                     moe_mode="second_half", capacity_factor=4.0)
    assert mcfg.layer_indices(cfg.num_layers) == (1,)
    params = moe_llama.init_moe_llama(jax.random.PRNGKey(1), cfg, mcfg)
    embeds = llama.embed(params, jnp.arange(8).reshape(1, 8) % cfg.vocab_size)
    h, _, aux = moe_llama.forward(params, cfg, mcfg, embeds, train=True)
    assert np.isfinite(np.asarray(h)).all()


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
