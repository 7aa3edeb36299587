"""Decode-ATTENTION micro-bisection at flagship shapes.

profile_decode.py puts the composed dense step at 19.6 ms vs a ~15.5 ms
traffic roofline (weights 6.3 GB + KV 201 MB/layer x 32). This harness
isolates the attention sub-step exactly as forward_decode stages it — a
32-layer lax.scan whose body dynamic-indexes its layer's [B, MAX, KV, D]
cache slice out of the full carried cache and runs ops/attention
decode_attention{,_quant} — so the XLA number includes whatever slice
materialization the fused step pays, not just the einsums.

Variants:
  bf16   — decode_attention over a bf16 cache (the composed default)
  int8   — decode_attention_quant (post-dot scales; composed "within
           noise" verdict, README)
  pallas / pallas8 — ops/pallas/decode_attention.py fused kernel (bf16 /
           int8-dequant-in-kernel), if present

Run: timeout 1200 python benchmarks/profile_decode_attn.py [--b 16]
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
    print(f"[attn {time.strftime('%H:%M:%S')}] {msg}", flush=True)


L, H, KV, D = 32, 32, 32, 128
MAX, LEN = 768, 640


def timeit(fn, *args, iters=20):
    out = fn(*args)
    _ = float(jnp.sum(out))  # axon: only a host fetch synchronizes
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _ = float(jnp.sum(out))
    return (time.time() - t0) / iters


def main():
    b = 16
    if "--b" in sys.argv:
        b = int(sys.argv[sys.argv.index("--b") + 1])
    variants = [a for a in sys.argv[1:] if not a.startswith("--")
                and not a.isdigit()] or ["bf16", "int8"]

    key = jax.random.PRNGKey(0)
    kq, kk, kv, kl = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, 1, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (L, b, MAX, KV, D), jnp.bfloat16)
    v = jax.random.normal(kv, (L, b, MAX, KV, D), jnp.bfloat16)
    length = jnp.full((b,), LEN, jnp.int32)
    kv_gb = 2 * L * b * MAX * KV * D * 2 / 1e9
    log(f"B={b} L={L} MAX={MAX} LEN={LEN}; bf16 cache {kv_gb:.2f} GB "
        f"(roofline @819GB/s: {kv_gb / 819 * 1e3:.2f} ms; int8 half)")

    from medplib_tpu.ops.attention import (decode_attention,
                                           decode_attention_quant,
                                           quantize_kv)

    if "bf16" in variants:
        @jax.jit
        def run_bf16(q, k, v, length):
            def body(acc, i):
                kc = jax.lax.dynamic_index_in_dim(k, i, 0, keepdims=False)
                vc = jax.lax.dynamic_index_in_dim(v, i, 0, keepdims=False)
                return acc + decode_attention(q, kc, vc, length), ()
            acc, _ = jax.lax.scan(body, jnp.zeros_like(q), jnp.arange(L))
            return acc

        dt = timeit(run_bf16, q, k, v, length)
        log(f"xla bf16:  {dt*1e3:7.2f} ms  ({dt/L*1e6:6.1f} us/layer)")

    if "int8" in variants:
        k8, k8s = jax.jit(quantize_kv)(k)
        v8, v8s = jax.jit(quantize_kv)(v)
        jax.block_until_ready((k8, v8))

        @jax.jit
        def run_int8(q, k8, k8s, v8, v8s, length):
            def body(acc, i):
                idx = lambda a: jax.lax.dynamic_index_in_dim(  # noqa: E731
                    a, i, 0, keepdims=False)
                return acc + decode_attention_quant(
                    q, idx(k8), idx(k8s), idx(v8), idx(v8s), length), ()
            acc, _ = jax.lax.scan(body, jnp.zeros((b, 1, H, D), jnp.float32),
                                  jnp.arange(L))
            return acc

        dt = timeit(run_int8, q, k8, k8s, v8, v8s, length)
        log(f"xla int8:  {dt*1e3:7.2f} ms  ({dt/L*1e6:6.1f} us/layer)")

    if "carry" in variants:
        # replicate forward_decode's exact staging: the caches ride the
        # scan CARRY and the new token is scatter-written before the read
        k_new = jax.random.normal(kl, (b, KV, D), jnp.bfloat16)

        @jax.jit
        def run_carry(q, k, v, k_new, length):
            bidx = jnp.arange(b)

            def body(carry, i):
                acc, ks, vs = carry
                ks = ks.at[i, bidx, length].set(k_new)
                vs = vs.at[i, bidx, length].set(k_new)
                kc = jax.lax.dynamic_index_in_dim(ks, i, 0, keepdims=False)
                vc = jax.lax.dynamic_index_in_dim(vs, i, 0, keepdims=False)
                return (acc + decode_attention(q, kc, vc, length + 1),
                        ks, vs), ()
            (acc, ks, vs), _ = jax.lax.scan(
                body, (jnp.zeros_like(q), k, v), jnp.arange(L))
            return acc

        dt = timeit(run_carry, q, k, v, k_new, length)
        log(f"xla carry: {dt*1e3:7.2f} ms  ({dt/L*1e6:6.1f} us/layer)")

    if "pallas" in variants or "pallas8" in variants:
        from medplib_tpu.ops.pallas.decode_attention import (
            decode_attention_pallas)
        if "pallas" in variants:
            @jax.jit
            def run_pl(q, k, v, length):
                def body(acc, i):
                    kc = jax.lax.dynamic_index_in_dim(k, i, 0,
                                                      keepdims=False)
                    vc = jax.lax.dynamic_index_in_dim(v, i, 0,
                                                      keepdims=False)
                    return acc + decode_attention_pallas(q, kc, vc,
                                                         length), ()
                acc, _ = jax.lax.scan(body, jnp.zeros_like(q),
                                      jnp.arange(L))
                return acc

            dt = timeit(run_pl, q, k, v, length)
            log(f"pallas bf16: {dt*1e3:7.2f} ms  ({dt/L*1e6:6.1f} us/layer)")


if __name__ == "__main__":
    main()
