"""Bisect the QLoRA train-step fixed cost (~24-30 s/step at B=2/T=48,
layer-count-independent, present even with a bf16 base — profile_train.py
step8_bf16 = 24.2 s/step vs fwd32 loss-only = 0.17 s).

Cases build the step up one piece at a time, all jit(donate_argnums=0) over
the SAME TrainState as the real trainer:

  noop       — state in/out untouched: donation + dispatch
  grad       — jax.grad w.r.t. trainable leaves only (no scan/optax)
  opt        — grad + optax masked-adamw update (no scan)
  full       — the real make_train_step
  full_scan  — force the ga=1 lax.scan wrapper (the pre-fix program)
  ga4 / ga4_unroll — 4-microbatch accumulation: lax.scan vs unrolled

Frozen leaves ride inside the donated state argument — NO closure capture of
concrete arrays (profile_train.grad_case's 2.02GB-constants mistake).

VERDICT (measured 8L quantized, B=2/T=48): noop 30 ms | grad 128 | opt 131 |
full WITH the length-1 scan 3193-10060 ms | full WITHOUT it 134-150 ms.
The degenerate scan was the whole regression; dropout costs ~16 ms.

Run: timeout 3600 python benchmarks/profile_step.py [cases...] [--layers N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/repo/.jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def log(msg):
    print(f"[step {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build(num_layers, quantized=True):
    from benchmarks.profile_train import build as _b
    return _b(num_layers, quantized)


def _mk_state(params):
    from medplib_tpu.config import TrainConfig
    from medplib_tpu.train.trainer import create_state
    tcfg = TrainConfig(lr=1e-4, warmup_steps=1, total_steps=100,
                       grad_accumulation_steps=1)
    state, tx = create_state(params, tcfg)
    return state, tx, tcfg


def _run(tag, step, state, *args, iters=3, fetch, unpack=lambda o: o):
    t0 = time.time()
    out = step(state, *args)
    _ = fetch(out)
    log(f"{tag}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    for _i in range(iters):
        out = step(unpack(out), *args)
        _ = fetch(out)
    log(f"{tag}: {(time.time()-t0)/iters*1e3:.0f} ms/step")


def case_noop(num_layers, quantized):
    from medplib_tpu.train.trainer import TrainState
    cfg, params, batch = build(num_layers, quantized)
    state, tx, tcfg = _mk_state(params)

    step = jax.jit(lambda s: TrainState(s.params, s.opt_state, s.step + 1),
                   donate_argnums=(0,))
    _run("noop", step, state, fetch=lambda o: int(o.step))


def case_grad(num_layers, quantized, with_opt=False):
    from medplib_tpu.models import medplib
    from medplib_tpu.train import lora as lora_lib
    from medplib_tpu.train.trainer import TrainState
    cfg, params, batch = build(num_layers, quantized)
    state, tx, tcfg = _mk_state(params)

    def step(state, batch):
        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        mask_tree = lora_lib.trainable_mask(state.params, tcfg.sft_modules)
        m_lv = jax.tree_util.tree_leaves(mask_tree)
        train_lv = [l for l, m in zip(leaves, m_lv) if m]

        def loss_from(tlv, b):
            it = iter(tlv)
            full = treedef.unflatten(
                [next(it) if m else l for l, m in zip(leaves, m_lv)])
            return medplib.model_forward(full, cfg, b, train=True,
                                         seg_flag=True, remat=True)["loss"]

        grads_lv, loss = jax.value_and_grad(loss_from)(train_lv, batch)[1], \
            None
        if not with_opt:
            it = iter(grads_lv)
            new_leaves = [(l - 0.0 * next(it)).astype(l.dtype) if m else l
                          for l, m in zip(leaves, m_lv)]
            params = treedef.unflatten(new_leaves)
            return TrainState(params, state.opt_state, state.step + 1)
        it = iter(grads_lv)
        grads = treedef.unflatten(
            [next(it) if m else jnp.zeros((), jnp.float32) for m in m_lv])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        u_lv = jax.tree_util.tree_leaves(updates)
        params = treedef.unflatten(
            [(p + u).astype(p.dtype) if m else p
             for p, u, m in zip(leaves, u_lv, m_lv)])
        return TrainState(params, opt_state, state.step + 1)

    tag = "opt" if with_opt else "grad"
    n_train = sum(jax.tree_util.tree_leaves(
        lora_lib.trainable_mask(params, tcfg.sft_modules)))
    log(f"{tag}: {n_train} trainable leaves")
    stepf = jax.jit(step, donate_argnums=(0,))
    _run(tag, stepf, state, batch, fetch=lambda o: int(o.step))


def case_full(num_layers, quantized, tag="full", no_dropout=False,
              force_scan=False, ga=1, unroll=False):
    import dataclasses
    from medplib_tpu.config import TrainConfig
    from medplib_tpu.train.trainer import create_state, make_train_step
    cfg, params, batch = build(num_layers, quantized)
    tcfg = TrainConfig(lr=1e-4, warmup_steps=1, total_steps=100,
                       grad_accumulation_steps=ga)
    if no_dropout:
        tcfg = dataclasses.replace(tcfg, lora_dropout=0.0)
    state, tx = create_state(params, tcfg)
    if force_scan:
        os.environ["MEDPLIB_TRAIN_FORCE_SCAN"] = "1"
    if unroll:
        os.environ["MEDPLIB_TRAIN_UNROLL_GA"] = "1"
    try:
        batches = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (ga,) + x.shape), batch)
        stepf = jax.jit(make_train_step(cfg, tcfg, tx), donate_argnums=(0,))
        _run(tag, stepf, state, batches,
             fetch=lambda o: float(o[1]["loss"]), unpack=lambda o: o[0])
    finally:
        os.environ.pop("MEDPLIB_TRAIN_FORCE_SCAN", None)
        os.environ.pop("MEDPLIB_TRAIN_UNROLL_GA", None)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    layers = 8
    if "--layers" in sys.argv:
        layers = int(sys.argv[sys.argv.index("--layers") + 1])
    quantized = "--bf16" not in sys.argv
    log(f"devices: {jax.devices()}  layers={layers} quantized={quantized}")
    for c in (args or ["noop", "grad", "opt", "full"]):
        {"noop": lambda: case_noop(layers, quantized),
         "grad": lambda: case_grad(layers, quantized),
         "opt": lambda: case_grad(layers, quantized, with_opt=True),
         "full": lambda: case_full(layers, quantized),
         "full_nodrop": lambda: case_full(layers, quantized, "full_nodrop",
                                          no_dropout=True),
         "full_scan": lambda: case_full(layers, quantized, "full_scan",
                                        force_scan=True),
         "ga4": lambda: case_full(layers, quantized, "ga4", ga=4),
         "ga4_unroll": lambda: case_full(layers, quantized, "ga4_unroll",
                                         ga=4, unroll=True)}[c]()
    log("done")
