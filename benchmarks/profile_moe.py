"""MoE layer-level bisection: where does flagship prefill time go?

Times ONE decoder layer at flagship prefill shapes (B=8, T=633 spliced)
with: dense MLP | MoE sort-dispatch (eval cf 2.0 = 2S padded slots) |
MoE dense-both (same FLOPs, no routing) | MoE gmm (Pallas grouped matmul,
S slots) when available. Run: timeout 2400 python benchmarks/profile_moe.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/repo/.jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from medplib_tpu.config import LlamaConfig, MoeConfig
from medplib_tpu.models import llama, moe_llama


def log(msg):
    print(f"[moe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench(mode, B=8, T=633, reps=4, iters=3):
    cfg = LlamaConfig(num_layers=1)
    mcfg = MoeConfig(enable=True, num_experts=2, top_k=1,
                     capacity_factor=1.5, eval_capacity_factor=2.0,
                     moe_mode="dense")
    actq = mode.endswith("_w8a8")
    mode = mode.replace("_w8a8", "")
    bits = 0   # expert weight bits: trailing 8 -> int8, 4 -> int4h(G=2)
    if mode[-1] in "84":
        bits = int(mode[-1])
        mode = mode[:-1]
    block_m = None  # "gmmd" = decode-tile gmm (block_m=32, the
    if mode == "gmmd":  # forward_decode default for int4h trees)
        mode, block_m = "gmm", 32
    if actq and bits == 0:
        bits = 8
    if mode == "dense":
        params = jax.jit(lambda k: llama.init_llama(k, cfg, jnp.bfloat16))(
            jax.random.PRNGKey(0))
    else:
        params = jax.jit(lambda k: moe_llama.init_moe_llama(
            k, cfg, mcfg, jnp.bfloat16))(jax.random.PRNGKey(0))
        params = moe_llama.strip_dense_mlp(params, cfg, mcfg)
        if bits:
            from medplib_tpu.utils.quantize import quantize_tree
            params["layers"]["moe"]["experts"] = quantize_tree(
                params["layers"]["moe"]["experts"], skip=(), bits=bits,
                int4_groups=2)
    jax.block_until_ready(params)
    from medplib_tpu.utils.quantize import dynamic_act_quant
    mask = jnp.ones((B, T), jnp.int32)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size),
                           jnp.bfloat16)

    def fwd(p, c):
        if mode == "dense":
            out, _, _ = llama.forward(p, cfg, c, mask)
        else:
            from medplib_tpu.ops.moe import moe_mlp

            def apply(layer_p, h):
                mp = layer_p["moe"]
                if block_m is not None:
                    mp = dict(mp)
                    mp["gmm_block_m"] = block_m
                return moe_mlp(mp, h, mcfg, train=False,
                               dispatch_mode=mode)

            out, _, _ = llama.forward(p, cfg, c, mask, mlp_apply=apply)
        return out

    @jax.jit
    def run(p, c):
        def body(c, _):
            out = fwd(p, c)
            s = 1.0 + 1e-20 * jnp.mean(out.astype(jnp.float32))
            return (c.astype(jnp.float32) * s).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return jnp.sum(c[0, 0, :8].astype(jnp.float32))

    tag = mode + (str(bits) if bits else "") + ("_w8a8" if actq else "")
    t0 = time.time()
    with dynamic_act_quant(actq):  # trace-time flag
        float(run(params, x0))
    log(f"{tag}: compile {time.time()-t0:.0f}s")
    t0 = time.time()
    for _ in range(iters):
        float(run(params, x0))
    dt = (time.time() - t0) / (iters * reps)
    log(f"{tag}: {dt*1e3:.2f} ms/layer @ B={B} T={T}")
    return dt


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    # DECODE=1: decode shapes (T=1, high reps) — isolates per-step MoE
    # weight traffic. Measured (B=12 T=1, v5e): sort8 1.76 ms/layer,
    # sort4h 1.65 — and a "run both experts through the dense fused
    # linears, select by gate" variant LOST to sort (1.95 / 1.73), so the
    # stacked-einsum sort dispatch stays the decode path; the variant was
    # dropped rather than shipped as a slower knob.
    decode = os.environ.get("DECODE", "0") == "1"
    modes = sys.argv[1:] or ["dense", "sort", "ragged"]
    for m in modes:
        if decode:
            bench(m, B=int(os.environ.get("B", "12")), T=1, reps=32,
                  iters=3)
        else:
            bench(m, B=int(os.environ.get("B", "8")))
    log("done")
