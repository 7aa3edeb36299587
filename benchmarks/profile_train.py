"""QLoRA train-step bisection: where do the 28.5 s/step at 32L go?

Config-6 (run_all.bench_train) measured 43.7 tok/s at B=2/T=48 spliced
(1246 tokens/step => 28.5 s/step) for the 32L frozen-int8 + bf16-LoRA
step, vs 6.5k tok/s for the 8L bf16 step — ~150x for 4x layers. This
harness isolates, at the same shapes:

  fwd8 / fwd32     — jitted LOSS only (no grad), int8 base + LoRA, remat
  step8 / step32   — the full train step (grad + adam update)
  fwd32_bf16       — loss only, bf16 base (no dequant in the path)
  step32_nosam     — full step with seg_flag=False (LLM-only loss path)

Run: timeout 3600 python benchmarks/profile_train.py [cases...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/repo/.jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def log(msg):
    print(f"[train {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build(num_layers, quantized=True):
    import __graft_entry__ as ge
    from medplib_tpu.train import lora as lora_lib

    cfg = ge._flagship_cfg(num_layers=num_layers)
    params = jax.jit(
        lambda k: __import__("medplib_tpu.models.medplib",
                             fromlist=["x"]).init_medplib(
            k, cfg, jnp.bfloat16))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if quantized:
        from medplib_tpu.utils import quantize as qz
        params["llm"] = qz.quantize_tree(params["llm"])
        jax.block_until_ready(params)
    params["llm"] = lora_lib.inject(jax.random.PRNGKey(1), params["llm"],
                                    ("q_proj", "v_proj"), r=8)
    batch = ge._make_batch(cfg, B=2, T=48, rng=np.random.default_rng(0))
    return cfg, params, batch


def time_it(fn, *args, iters=3):
    out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(first.astype(jnp.float32)))  # axon sync
    t0 = time.time()
    res = args
    for _i in range(iters):
        out = fn(*args)
        first = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.sum(first.astype(jnp.float32)))
    return (time.time() - t0) / iters


def fwd_case(tag, num_layers, quantized=True, seg_flag=True):
    from medplib_tpu.models import medplib
    cfg, params, batch = build(num_layers, quantized)

    loss = jax.jit(lambda p, b: medplib.model_forward(
        p, cfg, b, train=True, seg_flag=seg_flag, remat=True)["loss"])
    t0 = time.time()
    _ = float(loss(params, batch))
    log(f"{tag}: compile {time.time()-t0:.0f}s")
    dt = time_it(loss, params, batch)
    log(f"{tag}: {dt*1e3:.0f} ms/fwd")


def grad_case(tag, num_layers, quantized=True, seg_flag=True):
    """jax.grad of the loss w.r.t. LoRA leaves only — no optimizer, no
    accumulator scan, no state donation."""
    from medplib_tpu.models import medplib
    from medplib_tpu.train import lora as lora_lib
    cfg, params, batch = build(num_layers, quantized)
    mask = lora_lib.trainable_mask(params["llm"], ())
    leaves, treedef = jax.tree_util.tree_flatten(params["llm"])
    m_lv = jax.tree_util.tree_leaves(mask)
    train_lv = [l for l, m in zip(leaves, m_lv) if m]
    log(f"{tag}: {len(train_lv)} trainable leaves")

    def loss_from(tlv, p, b):
        it = iter(tlv)
        full = dict(p)
        full["llm"] = treedef.unflatten(
            [next(it) if m else l for l, m in zip(leaves, m_lv)])
        return medplib.model_forward(full, cfg, b, train=True,
                                     seg_flag=seg_flag,
                                     remat=True)["loss"]

    gfn = jax.jit(jax.grad(loss_from))
    t0 = time.time()
    g = gfn(train_lv, params, batch)
    _ = float(jnp.sum(g[0].astype(jnp.float32)))
    log(f"{tag}: compile {time.time()-t0:.0f}s")
    dt = time_it(gfn, train_lv, params, batch)
    log(f"{tag}: {dt*1e3:.0f} ms/grad")


def step_case(tag, num_layers, quantized=True, seg_flag=True, B=2):
    from medplib_tpu.config import TrainConfig
    from medplib_tpu.train.trainer import create_state, make_train_step
    cfg, params, batch = build(num_layers, quantized)
    if B != 2:
        batch = jax.tree_util.tree_map(lambda x: x[:B], batch)
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (1,) + x.shape), batch)
    tcfg = TrainConfig(lr=1e-4, warmup_steps=1, total_steps=100,
                       grad_accumulation_steps=1)
    state, tx = create_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg, tx, seg_flag=seg_flag),
                   donate_argnums=(0,))
    t0 = time.time()
    state, metrics = step(state, batches)
    _ = float(metrics["loss"])
    log(f"{tag}: compile {time.time()-t0:.0f}s")
    iters = 3
    t0 = time.time()
    for _i in range(iters):
        state, metrics = step(state, batches)
        _ = float(metrics["loss"])
    dt = (time.time() - t0) / iters
    log(f"{tag}: {dt*1e3:.0f} ms/step")


CASES = {
    "fwd8": lambda: fwd_case("fwd8", 8),
    "fwd32": lambda: fwd_case("fwd32", 32),
    "fwd32_bf16": lambda: fwd_case("fwd32_bf16", 32, quantized=False),
    "grad32": lambda: grad_case("grad32", 32),
    "grad8": lambda: grad_case("grad8", 8),
    "grad8_bf16": lambda: grad_case("grad8_bf16", 8, quantized=False),
    "step8": lambda: step_case("step8", 8),
    "step8_bf16": lambda: step_case("step8_bf16", 8, quantized=False),
    "step32": lambda: step_case("step32", 32),
    "step32_nosam": lambda: step_case("step32_nosam", 32, seg_flag=False),
    "step32_b1": lambda: step_case("step32_b1", 32, B=1),
}

if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    for c in (sys.argv[1:] or ["fwd32", "step8", "step32"]):
        CASES[c]()
    log("done")
