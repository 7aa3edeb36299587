"""Composed decode-step bisection at flagship shapes (B=16, ctx ~640).

The headline MAXNEW subtraction measures ~26 ms/decode step for the MoE
flagship vs ~14 ms for the dense model — yet both move the same HBM bytes
per step (weights ~6.3 GB + bf16 KV reads ~5.4 GB -> ~14.6 ms at v5e
bandwidth). This harness times ONE jitted forward_decode (the exact
composed program: layer scan, KV carry scatter, cache reads) per variant:

  dense8   — 32L dense LLM, int8 weights
  moe4     — 32L x 2e, int8 attn + int4h(G=2) experts, gmm decode (default)
  moe4sort — same tree, capacity-sort decode (MEDPLIB_DECODE_GMM=0)
  moe8     — int8 experts (B capped by HBM: run with B=8)
  *kvq     — int8 KV-cache variants. NOTE: these OOM in THIS harness
             (the 4-array quantized cache defeats the donate-aliasing my
             scan wrapper relies on); use the composed bench
             (BENCH_KVQUANT=1 python bench.py) for kvq numbers. The
             "within noise" composed kvq result is roofline-consistent:
             decode is ~15% of batch time, so halving KV traffic is ~2%.

MEASURED (B=16 ctx=640): dense8 19.63 | moe4 big-block 23.37 (prefill
blocks: 25.46) | moe4sort 27.38 ms/step; block_m 16/64: 27.52/23.90.

Run: timeout 3600 python benchmarks/profile_decode.py [cases...] [--b N]
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
    print(f"[dec {time.strftime('%H:%M:%S')}] {msg}", flush=True)


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


def run(tag, moe: bool, expert_bits: int, B: int, ctx: int = 640,
        iters: int = 20, kvq: bool = False):
    from medplib_tpu.models import llama, moe_llama
    cfg, params = build(moe, expert_bits)
    lcfg = cfg.llm
    cache = llama.KVCache.init(lcfg, B, ctx + 32,
                               dtype=jnp.bfloat16, quant=kvq)
    # pretend ctx tokens are already in the cache
    cache = cache._replace(length=jnp.full((B,), ctx, jnp.int32))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, lcfg.hidden_size),
                          jnp.bfloat16)

    # N steps inside ONE jitted lax.scan (the composed generate's shape):
    # a per-step host dispatch through the axon tunnel costs ~35-40 ms RTT
    # and swamps the <10 ms differences this harness exists to measure.
    STEPS = 32

    def one(p, carry, _):
        h, c = carry
        h2, c2 = (moe_llama.forward_decode(p, lcfg, cfg.moe, h, c) if moe
                  else llama.forward_decode(p, lcfg, h, c))
        # feed the output back in so steps cannot be elided or overlapped
        return (h2[..., :lcfg.hidden_size].astype(h.dtype), c2), ()

    def many(p, h0, c0):
        (h, c), _ = jax.lax.scan(
            lambda carry, _: one(p, carry, None), (h0, c0), None,
            length=STEPS)
        return jnp.sum(h.astype(jnp.float32)), c

    step = jax.jit(many, donate_argnums=(2,))
    t0 = time.time()
    s, cache = step(params["llm"], x, cache)
    _ = float(s)
    log(f"{tag}: compile+first {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(iters):
        s, cache = step(params["llm"], x, cache)
        _ = float(s)
    dt = (time.time() - t0) / (iters * STEPS)
    log(f"{tag}: {dt*1e3:.2f} ms/step @ B={B} ctx={ctx} "
        f"(x{STEPS} in-program)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = 16
    if "--b" in sys.argv:
        B = int(sys.argv[sys.argv.index("--b") + 1])
    log(f"devices: {jax.devices()}  B={B}")
    for c in (args or ["dense8", "moe4"]):
        if c == "dense8":
            run("dense8", False, 0, B)
        elif c == "dense8kvq":
            run("dense8kvq", False, 0, B, kvq=True)
        elif c == "moe4":
            run("moe4", True, 4, B)
        elif c == "moe4kvq":
            run("moe4kvq", True, 4, B, kvq=True)
        elif c == "moe4sort":
            os.environ["MEDPLIB_DECODE_GMM"] = "0"
            try:
                run("moe4sort", True, 4, B)
            finally:
                os.environ.pop("MEDPLIB_DECODE_GMM", None)
        elif c == "moe4nofuse":
            # 3-call gmm decode (pre fused-kernel default)
            os.environ["MEDPLIB_DECODE_FUSED"] = "0"
            try:
                run("moe4nofuse", True, 4, B)
            finally:
                os.environ.pop("MEDPLIB_DECODE_FUSED", None)
        elif c == "moe8":
            run("moe8", True, 8, B)
        elif c == "moe4noroute":
            # DIAGNOSTIC: constant routing (no router matmul / softmax /
            # argmax / aux chain) feeding the fused kernel — bounds the
            # out-of-kernel routing cost named in README's decode-gap note
            import medplib_tpu.ops.moe as moemod
            from medplib_tpu.ops.pallas.moe_decode import moe_ffn_decode_int4h
            orig = moemod._gmm_moe

            def noroute(xs, logits, experts, dtype, block_m=512,
                        gid_offset=None):
                s = xs.shape[0]
                e = logits.shape[-1]
                idx = jnp.arange(s, dtype=jnp.int32) % e
                gate_s = jnp.ones((s,), jnp.float32)
                y = moe_ffn_decode_int4h(xs, experts, idx, gate_s,
                                         gid_offset, e, int8_x=True)
                return y.astype(dtype), jnp.zeros((), jnp.float32)

            moemod._gmm_moe = noroute
            try:
                run("moe4noroute", True, 4, B)
            finally:
                moemod._gmm_moe = orig
        # (round-5 note: the moe4bitcast / moe4nounpack diagnostics —
        # 19.83 / 19.72 ms/step vs 21.10 default — decided the
        # interleaved-pairs layout migration; the hardware bitcast unpack
        # is now the ONLY path, so the MEDPLIB_DECODE_UNPACK knob and
        # these cases are gone)
        elif c == "moe4bf16x":
            # fused kernel with bf16 activations (no A8 row/block quant)
            os.environ["MEDPLIB_DECODE_A8"] = "0"
            try:
                run("moe4bf16x", True, 4, B)
            finally:
                os.environ.pop("MEDPLIB_DECODE_A8", None)
    log("done")
