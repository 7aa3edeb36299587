"""Composed prefill bisection at flagship shapes (VERDICT r4 #6).

The headline MoE flagship serves 14.1 masks/s vs 15.7-16.0 for the dense
model at the same batch, and prefill is ~82% of the per-batch budget —
so the ~10% model gap lives almost entirely in the prefill FFN (attention
is int8 in BOTH variants and identical). This harness times ONE jitted
32-layer prefill forward per variant (the exact composed program: layer
scan, no KV-cache writes — both variants omit them equally) and bisects
the delta with targeted monkeypatch/env variants:

  dense8      — dense MLP, XLA W8A8 (dynamic_act_quant traced on)
  moe4        — 2-expert int4h stacked whole-stack gmm, W4A8 (the ship)
  moe8        — int8 experts, W8A8 gmm (isolates the int4 in-kernel
                nibble-unpack + finer: gmm-vs-XLA with SAME s8 MXU mode)
  moe4noroute — router matmul + softmax/argmax kept, but align_groups
                replaced by a static identity layout (pad + arange dest,
                round-robin tile_gid): bounds the cumsum/scatter/gather
                dispatch cost named in ops/pallas/gmm.align_groups
  moe4noaq    — bf16-x gmm (no quantize_rows passes, bf16 MXU): NOT a
                subtraction case (the MXU mode changes too) — reads as
                "what the quantize passes + s8 dots buy together"

Run: timeout 3600 python benchmarks/profile_prefill.py [cases...] [--b N]
Shapes default to B=16, T=640 (576 image tokens + text, the headline
spliced prefill width).
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
    print(f"[pre {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build(moe: bool, expert_bits: int = 4):
    import __graft_entry__ as ge
    cfg = ge._flagship_cfg(num_layers=32, moe=moe)
    if moe:
        params = ge._init_flagship_moe_quantized(
            jax.random.PRNGKey(0), cfg, expert_bits=expert_bits,
            attn_bits=8)
    else:
        from medplib_tpu.models import medplib
        from medplib_tpu.utils import quantize as qz
        params = jax.jit(
            lambda k: medplib.init_medplib(k, cfg, jnp.bfloat16)
        )(jax.random.PRNGKey(0))
        params = qz.quantize_tree(params)
    jax.block_until_ready(params)
    return cfg, params


def run(tag, moe: bool, expert_bits: int, B: int, T: int = 640,
        iters: int = 8, actq: bool = True):
    from medplib_tpu.models import llama, moe_llama
    from medplib_tpu.utils.quantize import dynamic_act_quant
    cfg, params = build(moe, expert_bits)
    lcfg = cfg.llm
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, lcfg.hidden_size),
                          jnp.bfloat16)

    def fwd(p, e):
        if moe:
            h, _, aux = moe_llama.forward(p, lcfg, cfg.moe, e, train=False)
            return jnp.sum(h.astype(jnp.float32)) + aux
        h, _, _ = llama.forward(p, lcfg, e)
        return jnp.sum(h.astype(jnp.float32))

    with dynamic_act_quant(actq):
        step = jax.jit(fwd)
        t0 = time.time()
        s = float(step(params["llm"], x))
    log(f"{tag}: compile+first {time.time()-t0:.1f}s (sum {s:.1f})")
    t0 = time.time()
    for _ in range(iters):
        s = float(step(params["llm"], x))
    dt = (time.time() - t0) / iters
    log(f"{tag}: {dt*1e3:.2f} ms/prefill @ B={B} T={T} "
        f"({B*T/dt:.0f} tok/s)")
    del params
    return dt


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = 16
    if "--b" in sys.argv:
        B = int(sys.argv[sys.argv.index("--b") + 1])
    log(f"devices: {jax.devices()}  B={B}")
    for c in (args or ["dense8", "moe4"]):
        if c == "dense8":
            run("dense8", False, 0, B)
        elif c == "moe4":
            run("moe4", True, 4, B)
        elif c == "moe8":
            run("moe8", True, 8, B)
        elif c == "moe4noaq":
            run("moe4noaq", True, 4, B, actq=False)
        elif c == "moe4noroute":
            # static identity group alignment: same gmm calls, same pad
            # rows, but no one_hot/cumsum/scatter/tile-gid computation —
            # bounds the out-of-kernel routing/alignment dispatch cost
            import medplib_tpu.ops.moe as moemod
            import medplib_tpu.ops.pallas.gmm as gmmmod
            orig = gmmmod.align_groups

            def static_align(xs, expert_idx, num_experts, block_m):
                s = xs.shape[0]
                sp = (s // block_m + num_experts) * block_m
                x_al = jnp.pad(xs, ((0, sp - s), (0, 0)))
                dest = jnp.arange(s, dtype=jnp.int32)
                tile_gid = (jnp.arange(sp // block_m, dtype=jnp.int32)
                            % num_experts)
                return x_al, dest, tile_gid

            gmmmod.align_groups = static_align
            # ops/moe imports align_groups inside the function body, so
            # patching the module attribute is enough
            try:
                run("moe4noroute", True, 4, B)
            finally:
                gmmmod.align_groups = orig
    log("done")
