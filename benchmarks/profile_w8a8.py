"""W8A8 prefill gap bisection (VERDICT round-2 weak #2).

The composed W8A8 prefill bought only +1.7% over weight-only int8 even
though the raw s8xs8 dot is 1.94x bf16. This times each piece at the EXACT
flagship prefill shapes (B=14, T=623 -> rows=8722) to find where the factor
goes. All repetition happens INSIDE one jitted scan with a data dependency
(the axon tunnel costs ~35 ms per eager dispatch, which would drown a
1-2 ms matmul), and one scalar is fetched per measurement.

Run on the real chip: timeout 1800 python benchmarks/profile_w8a8.py
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/repo/.jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from medplib_tpu.utils.quantize import (quantize_tree, int8_dyn_matmul,
                                        dynamic_act_quant)


def log(msg):
    print(f"[w8a8 {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timeit_injit(step, x0, reps, iters=3):
    """step: carry -> carry (same shape/dtype). Returns secs per step call.
    The rep loop is a lax.scan inside ONE jitted program; timing fetches a
    single scalar."""
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return jnp.sum(c[0, :8].astype(jnp.float32))  # tiny fetch
    float(run(x0))  # compile + warm
    t0 = time.time()
    for _ in range(iters):
        float(run(x0))
    return (time.time() - t0) / (iters * reps)


def bench_dots():
    rows, K = 14 * 623, 4096
    for N, tag in ((4096, "attn"), (11008, "mlp")):
        x = jax.random.normal(jax.random.PRNGKey(0), (rows, K), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16
                              ) * 0.02
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 500), -127, 127
                      ).astype(jnp.int8)
        ws = jnp.full((1, N), 1 / 500, jnp.float32)
        flops = 2.0 * rows * K * N

        # feedback: next x = x scaled by a scalar derived from ALL of y —
        # a full mean, so XLA cannot slice-propagate the dot down to one
        # row (y[0,0] feedback measured 521 "TF/s", i.e. a matvec)
        def fb(x, y):
            s = 1.0 + 1e-20 * jnp.mean(y.astype(jnp.float32))
            return (x.astype(jnp.float32) * s).astype(x.dtype)

        def s_bf16(c):
            return fb(c, c @ w)

        def s_s8raw(c):
            cq = jnp.clip(jnp.round(c.astype(jnp.float32) * 100), -127, 127
                          ).astype(jnp.int8)  # one-time-ish cost included
            y = jax.lax.dot_general(cq, wq, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return fb(c, y)

        def s_quant(c):
            cf = c.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(cf), -1, keepdims=True),
                            1e-12) / 127
            cq = jnp.clip(jnp.round(cf / s), -127, 127).astype(jnp.int8)
            return fb(c, cq.astype(jnp.bfloat16) + s.astype(jnp.bfloat16))

        def s_full(c):
            return fb(c, int8_dyn_matmul(c, wq, ws, False))

        def s_wonly(c):
            return fb(c, c @ (wq.astype(jnp.bfloat16) *
                              ws.astype(jnp.bfloat16)))

        r = {}
        for name, fn in [("bf16", s_bf16), ("w-only-int8", s_wonly),
                         ("s8raw+staticq", s_s8raw), ("dynq-alone", s_quant),
                         ("w8a8-full", s_full)]:
            dt = timeit_injit(fn, x, reps=20)
            r[name] = dt
            tf = flops / dt / 1e12 if name != "dynq-alone" else 0
            log(f"  [{tag} N={N}] {name:14s} {dt*1e3:7.3f} ms  "
                f"{tf:6.0f} TF/s")
        log(f"  [{tag}] w8a8 vs bf16: {r['bf16']/r['w8a8-full']:.2f}x | "
            f"vs w-only: {r['w-only-int8']/r['w8a8-full']:.2f}x")


def bench_layer(n_layers, B=14, T=623, actq=True):
    from medplib_tpu.config import LlamaConfig
    from medplib_tpu.models import llama

    cfg = LlamaConfig(num_layers=n_layers)
    params = jax.jit(lambda k: llama.init_llama(k, cfg, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    params = quantize_tree(params)
    jax.block_until_ready(params)
    x0 = jax.random.normal(jax.random.PRNGKey(1),
                           (B, T, cfg.hidden_size), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)

    def step(p, c):
        out, _, _ = llama.forward(p, cfg, c, mask)
        s = 1.0 + 1e-20 * out[0, 0, 0].astype(jnp.float32)
        return (c.astype(jnp.float32) * s).astype(c.dtype)

    def timeit(c0, reps, iters=3):
        # params must be a jit ARG: closing over them bakes the full weight
        # tree into the HLO as constants, which the axon remote-compile
        # endpoint rejects with HTTP 413 past ~a GB
        @jax.jit
        def run(p, c):
            def body(c, _):
                return step(p, c), ()
            c, _ = jax.lax.scan(body, c, None, length=reps)
            return jnp.sum(c[0, 0, :8].astype(jnp.float32))
        float(run(params, c0))
        t0 = time.time()
        for _ in range(iters):
            float(run(params, c0))
        return (time.time() - t0) / (iters * reps)

    per_tok = (4 * 4096 * 4096 + 3 * 4096 * 11008 + 2 * T * 4096) * 2.0
    flops = B * T * per_tok * n_layers
    with dynamic_act_quant(False):
        t_w8 = timeit(x0, reps=4)
    with dynamic_act_quant(True):
        t_a8 = timeit(x0, reps=4)
    log(f"[{n_layers}L scan prefill B={B} T={T}] weight-only "
        f"{t_w8*1e3:.1f}ms ({flops/t_w8/1e12:.0f} TF/s) | W8A8 "
        f"{t_a8*1e3:.1f}ms ({flops/t_a8/1e12:.0f} TF/s) | "
        f"speedup {t_w8/t_a8:.3f}x")


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    bench_dots()
    bench_layer(1)
    bench_layer(4)
    log("done")
