"""Training loop: LoRA injection/merge, train step, checkpoint resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import LlamaConfig, MedplibConfig, TrainConfig
from medplib_tpu.models import llama, medplib
from medplib_tpu.train import lora
from medplib_tpu.train.trainer import Trainer, create_state, make_train_step


def _tiny():
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(cfg, B=2, T=10, ga=1, seed=0):
    from test_medplib import _make_batch
    b = _make_batch(cfg, B=B, T=T, seed=seed)
    if ga:
        return jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (ga,) + x.shape), b)
    return b


def test_lora_inject_and_merge_equivalence():
    cfg = LlamaConfig.tiny()
    params = llama.init_llama(jax.random.PRNGKey(0), cfg)
    params = lora.inject(jax.random.PRNGKey(1), params,
                         ("q_proj", "v_proj"), r=4)
    assert "lora_a" in params["layers"]["attn"]["q_proj"]
    # random (nonzero) lora_b so merge is a real test
    params["layers"]["attn"]["q_proj"]["lora_b"] = (
        jax.random.normal(jax.random.PRNGKey(2),
                          params["layers"]["attn"]["q_proj"]["lora_b"].shape)
        * 0.02)
    ids = jnp.arange(8).reshape(1, 8) % cfg.vocab_size
    h_lora, _, _ = llama.forward(params, cfg, llama.embed(params, ids))
    merged = lora.merge(params)
    assert "lora_a" not in merged["layers"]["attn"]["q_proj"]
    h_merged, _, _ = llama.forward(merged, cfg, llama.embed(merged, ids))
    np.testing.assert_allclose(np.asarray(h_lora), np.asarray(h_merged),
                               rtol=1e-4, atol=1e-4)


def test_trainable_mask_selects_lora_and_sft():
    cfg = LlamaConfig.tiny()
    params = lora.inject(jax.random.PRNGKey(0),
                         llama.init_llama(jax.random.PRNGKey(0), cfg),
                         ("q_proj",), r=2)
    mask = lora.trainable_mask(params, ("lm_head", "embed_tokens"))
    assert mask["layers"]["attn"]["q_proj"]["lora_a"] is True
    assert mask["layers"]["attn"]["q_proj"]["kernel"] is False
    assert mask["lm_head"]["kernel"] is True
    assert mask["embed_tokens"]["embedding"] is True
    assert mask["norm"]["weight"] is False


@pytest.mark.slow
def test_train_step_updates_only_trainable():
    cfg, params = _tiny()
    params["llm"] = lora.inject(jax.random.PRNGKey(1), params["llm"],
                                ("q_proj", "v_proj"), r=2)
    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=10,
                       grad_accumulation_steps=2,
                       sft_modules=("text_hidden_fcs", "mask_decoder",
                                    "lm_head", "embed_tokens"))
    state, tx = create_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, tx))
    batches = _batch(cfg, ga=2)
    old_frozen = np.asarray(
        state.params["llm"]["layers"]["attn"]["q_proj"]["kernel"])
    # lora_b gets the first nonzero gradient (lora_a's grad is zero while
    # lora_b is still at its zero init)
    old_lora = np.asarray(
        state.params["llm"]["layers"]["attn"]["q_proj"]["lora_b"])
    old_head = np.asarray(state.params["text_hidden_fcs"]["fc1"]["kernel"])
    # two steps: warmup LR is exactly 0 at optimizer step 0
    state, metrics = step(state, batches)
    state, metrics = step(state, batches)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    np.testing.assert_array_equal(
        np.asarray(state.params["llm"]["layers"]["attn"]["q_proj"]["kernel"]),
        old_frozen)
    assert np.abs(np.asarray(
        state.params["llm"]["layers"]["attn"]["q_proj"]["lora_b"])
        - old_lora).sum() > 0
    assert np.abs(np.asarray(
        state.params["text_hidden_fcs"]["fc1"]["kernel"]) - old_head).sum() > 0


@pytest.mark.slow
def test_loss_decreases_over_steps():
    cfg, params = _tiny()
    tcfg = TrainConfig(lr=5e-4, warmup_steps=1, total_steps=50,
                       grad_accumulation_steps=1, lora_enable=False)
    state, tx = create_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, tx))
    batches = _batch(cfg, ga=1)
    losses = []
    for _ in range(6):
        state, metrics = step(state, batches)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_trainer_checkpoint_resume(tmp_path):
    cfg, params = _tiny()
    tcfg = TrainConfig(lr=1e-4, warmup_steps=1, total_steps=10, epochs=1,
                       steps_per_epoch=2, grad_accumulation_steps=1,
                       save_steps=1, log_steps=100, lora_enable=False)

    def iterator():
        while True:
            yield _batch(cfg, ga=1)

    t = Trainer(cfg, tcfg, params, str(tmp_path / "run"))
    final = t.fit(iterator, steps_per_epoch=2)
    assert final == 2
    # second trainer resumes at step 2 -> no more steps in the epoch
    t2 = Trainer(cfg, tcfg, medplib.init_medplib(jax.random.PRNGKey(9), cfg),
                 str(tmp_path / "run"))
    resumed = t2.resume_if_possible()
    assert resumed == 2
    np.testing.assert_allclose(
        np.asarray(t2.state.params["text_hidden_fcs"]["fc1"]["kernel"]),
        np.asarray(t.state.params["text_hidden_fcs"]["fc1"]["kernel"]))


@pytest.mark.slow
def test_lora_dropout_applied_and_deterministic():
    """TrainConfig.lora_dropout is real (VERDICT round-2 missing #2): under
    lora_dropout_ctx the adapter input is dropped; rate=0 and no-ctx are
    identical; the mask is deterministic in the key."""
    cfg = LlamaConfig.tiny()
    params = lora.inject(jax.random.PRNGKey(0),
                         llama.init_llama(jax.random.PRNGKey(0), cfg),
                         ("q_proj",), r=4)
    node = params["layers"]["attn"]["q_proj"]
    # nonzero lora_b so the adapter path contributes
    node["lora_b"] = jax.random.normal(jax.random.PRNGKey(2),
                                       node["lora_b"].shape) * 0.1
    n2 = jax.tree_util.tree_map(lambda a: a[0], node)  # unstack layer 0
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 64, cfg.hidden_size))

    y_plain = lora.linear_t(n2, x)
    with lora.lora_dropout_ctx(jax.random.PRNGKey(7), 0.0):
        y_rate0 = lora.linear_t(n2, x)
    np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_rate0))

    with lora.lora_dropout_ctx(jax.random.PRNGKey(7), 0.5):
        y_a = lora.linear_t(n2, x)
    with lora.lora_dropout_ctx(jax.random.PRNGKey(7), 0.5):
        y_b = lora.linear_t(n2, x)
    with lora.lora_dropout_ctx(jax.random.PRNGKey(8), 0.5):
        y_c = lora.linear_t(n2, x)
    assert np.abs(np.asarray(y_a) - np.asarray(y_plain)).sum() > 0
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))
    assert np.abs(np.asarray(y_a) - np.asarray(y_c)).sum() > 0

    # the ctx is trace-time only: a jitted program captures the choice
    f = jax.jit(lambda p, v: lora.linear_t(p, v))
    with lora.lora_dropout_ctx(jax.random.PRNGKey(7), 0.9):
        y_jit = f(n2, x)
    assert np.abs(np.asarray(y_jit) - np.asarray(y_plain)).sum() > 0


@pytest.mark.slow
def test_train_step_with_lora_dropout_differs_across_steps():
    """Same batch, different steps -> different dropout masks -> different
    loss trajectories than the rate=0 run (wiring check through
    make_train_step)."""
    cfg, params = _tiny()
    params["llm"] = lora.inject(jax.random.PRNGKey(1), params["llm"],
                                ("q_proj", "v_proj"), r=2)
    # nonzero adapters so dropout has something to act on
    params["llm"] = jax.tree_util.tree_map(lambda x: x, params["llm"])
    qb = params["llm"]["layers"]["attn"]["q_proj"]
    qb["lora_b"] = jax.random.normal(jax.random.PRNGKey(5),
                                     qb["lora_b"].shape) * 0.1
    batches = _batch(cfg, ga=1)

    def run(rate):
        tcfg = TrainConfig(lr=0.0, warmup_steps=1, total_steps=10,
                           grad_accumulation_steps=1, lora_dropout=rate)
        state, tx = create_state(params, tcfg)
        step = jax.jit(make_train_step(cfg, tcfg, tx))
        _, m1 = step(state, batches)
        return float(m1["loss"])

    l_drop = run(0.7)
    l_plain = run(0.0)
    assert np.isfinite(l_drop) and np.isfinite(l_plain)
    assert l_drop != l_plain


@pytest.mark.slow
def test_train_mask_decoder_flag_freezes_decoder(tmp_path):
    """SegConfig.train_mask_decoder=False drops mask_decoder from the
    trainable set (reference requires_grad gating, MedPLIB.py:141-164)."""
    import dataclasses as dc
    cfg, params = _tiny()
    cfg2 = dc.replace(cfg, seg=dc.replace(cfg.seg, train_mask_decoder=False))
    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=10,
                       grad_accumulation_steps=1)
    t = Trainer(cfg2, tcfg, params, str(tmp_path / "run"))
    assert "mask_decoder" not in t.tcfg.sft_modules
    mask = lora.trainable_mask(t.state.params, t.tcfg.sft_modules)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    md = [v for path, v in leaves if any(
        getattr(k, "key", None) == "mask_decoder" for k in path)]
    assert md and not any(md)
    # default stays trainable
    t2 = Trainer(cfg, tcfg, medplib.init_medplib(jax.random.PRNGKey(1), cfg),
                 str(tmp_path / "run2"))
    assert "mask_decoder" in t2.tcfg.sft_modules


@pytest.mark.slow
def test_qlora_train_step_int8_base(tmp_path):
    """QLoRA stage-3 composition (VERDICT round-2 task 8): frozen int8 base
    + bf16 LoRA trains — the partitioned train step differentiates only
    trainable leaves, the int8 kernels never change, loss decreases."""
    from medplib_tpu.utils import quantize as qz
    cfg, params = _tiny()
    params["llm"] = qz.quantize_tree(params["llm"])
    params["llm"] = lora.inject(jax.random.PRNGKey(2), params["llm"],
                                ("q_proj", "v_proj"), r=2)
    qn = params["llm"]["layers"]["attn"]["q_proj"]
    assert qn["kernel"].dtype == jnp.int8 and "lora_a" in qn
    # quantized sft module (lm_head) must come out frozen
    mask = lora.trainable_mask(params, ("lm_head", "text_hidden_fcs"))
    assert mask["llm"]["lm_head"]["kernel"] is False
    assert mask["text_hidden_fcs"]["fc1"]["kernel"] is True
    assert mask["llm"]["layers"]["attn"]["q_proj"]["lora_a"] is True

    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=10,
                       grad_accumulation_steps=1, lora_dropout=0.0)
    state, tx = create_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, tx))
    batches = _batch(cfg, ga=1)
    before = np.asarray(
        state.params["llm"]["layers"]["attn"]["q_proj"]["kernel"])
    losses = []
    for _ in range(5):
        state, m = step(state, batches)
        losses.append(float(m["loss"]))
    after = np.asarray(
        state.params["llm"]["layers"]["attn"]["q_proj"]["kernel"])
    np.testing.assert_array_equal(before, after)
    assert after.dtype == np.int8
    assert np.abs(np.asarray(
        state.params["llm"]["layers"]["attn"]["q_proj"]["lora_b"])).sum() > 0
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_ga1_direct_path_matches_forced_scan(monkeypatch):
    """ga=1 skips the length-1 lax.scan (measured 20x+ step-time pathology,
    benchmarks/profile_step.py); the direct program must be numerically
    identical to the scanned one — same dropout keys, same update."""
    cfg, params = _tiny()
    params["llm"] = lora.inject(jax.random.PRNGKey(1), params["llm"],
                                ("q_proj", "v_proj"), r=2)
    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=10,
                       grad_accumulation_steps=1)
    batches = _batch(cfg, ga=1)

    def run(force_scan):
        if force_scan:
            monkeypatch.setenv("MEDPLIB_TRAIN_FORCE_SCAN", "1")
        else:
            monkeypatch.delenv("MEDPLIB_TRAIN_FORCE_SCAN", raising=False)
        state, tx = create_state(params, tcfg)
        step = jax.jit(make_train_step(cfg, tcfg, tx))
        state, m1 = step(state, batches)
        state, m2 = step(state, batches)
        return state, m1, m2

    s_direct, d1, d2 = run(False)
    s_scan, c1, c2 = run(True)
    for k in d2:
        np.testing.assert_allclose(float(d1[k]), float(c1[k]), rtol=1e-5,
                                   err_msg=k)
        np.testing.assert_allclose(float(d2[k]), float(c2[k]), rtol=1e-5,
                                   err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5),
        s_direct.params, s_scan.params)


@pytest.mark.slow
def test_ga_unroll_matches_scan(monkeypatch):
    """The unrolled ga>1 accumulator (default for small ga) must match the
    scanned accumulator (MEDPLIB_TRAIN_FORCE_SCAN) step-for-step."""
    cfg, params = _tiny()
    tcfg = TrainConfig(lr=1e-3, warmup_steps=1, total_steps=10,
                       grad_accumulation_steps=2, lora_enable=False,
                       lora_dropout=0.0)
    b0 = _batch(cfg, ga=0, seed=0)
    b1 = _batch(cfg, ga=0, seed=3)
    batches = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), b0, b1)

    def run(unroll):
        monkeypatch.delenv("MEDPLIB_TRAIN_UNROLL_GA", raising=False)
        if unroll:
            monkeypatch.delenv("MEDPLIB_TRAIN_FORCE_SCAN", raising=False)
        else:
            monkeypatch.setenv("MEDPLIB_TRAIN_FORCE_SCAN", "1")
        state, tx = create_state(params, tcfg)
        step = jax.jit(make_train_step(cfg, tcfg, tx))
        state, m = step(state, batches)
        return state, m

    s_u, m_u = run(True)
    s_s, m_s = run(False)
    for k in m_u:
        np.testing.assert_allclose(float(m_u[k]), float(m_s[k]), rtol=1e-5,
                                   err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5),
        s_u.params, s_s.params)
