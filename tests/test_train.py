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
