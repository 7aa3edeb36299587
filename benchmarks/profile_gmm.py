"""gmm kernel bisection at flagship FFN shapes: where is the int8 MXU rate?

The MoE prefill layer (gmm W8A8) measured ~= dense bf16 (22.4 vs 22.0
ms/layer) even though the FFN dots run s8xs8 on the nominally 2x int8 MXU.
This microbench isolates, at the exact flagship gmm shapes
(Sp=5120 aligned rows, K=4096, N=11008 and the down-proj transpose):

  bf16      — XLA jnp.dot at the same logical shape (the bar to beat)
  s8raw     — XLA s8 x s8 -> s32 dot, no scales (the hardware ceiling)
  gmm8      — Pallas gmm, int8 weights, bf16 x (weight-only)
  gmm_w8a8  — Pallas gmm, int8 weights + pre-quantized int8 x (+scales)
  quantrows — the quantize_rows activation pass alone (the W8A8 overhead)
  chain     — the full 3-matmul SwiGLU FFN via _gmm_moe-style composition

BN=1024 etc. sweep block sizes via env. Timing: in-jit scan loops with a
mean feedback (memory: slice-propagation eats the dot otherwise); params
passed as args (never closed over: axon remote-compile 413s).

Run: timeout 2400 python benchmarks/profile_gmm.py [cases...]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/root/repo/.jax_cache", exist_ok=True)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from medplib_tpu.ops.pallas.gmm import gmm, quantize_rows

SP, K, N, E = 5120, 4096, 11008, 2


def log(msg):
    print(f"[gmm {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timeit(tag, build, reps=64, iters=3, flops=None):
    """build() -> (fn(ops) -> scalar-feedback array, ops tuple)."""
    fn, ops = build()

    @jax.jit
    def run(ops):
        def body(c, _):
            out = fn(ops, c)
            s = 1.0 + 1e-20 * jnp.mean(out.astype(jnp.float32))
            return c * s, ()
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=reps)
        return c

    t0 = time.time()
    float(run(ops))
    log(f"{tag}: compile {time.time() - t0:.0f}s")
    t0 = time.time()
    for _ in range(iters):
        float(run(ops))
    dt = (time.time() - t0) / (iters * reps)
    tf = f", {flops / dt / 1e12:.0f} TF/s" if flops else ""
    log(f"{tag}: {dt * 1e3:.3f} ms{tf}")
    return dt


def main():
    log(f"devices: {jax.devices()}")
    bn = int(os.environ.get("BN", "512"))
    bm = int(os.environ.get("BM", "512"))
    bk = os.environ.get("BK")
    bk = int(bk) if bk else None
    rng = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(rng)
    x = jax.random.normal(kx, (SP, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.bfloat16)
    we = jnp.stack([w, w * 0.5])                       # [E, K, N]
    w8 = jnp.clip(jnp.round(we * 16), -127, 127).astype(jnp.int8)
    wsc = jnp.full((E, 1, N), 1 / 16, jnp.float32)
    xq, xsc = quantize_rows(x)
    tile_gid = (jnp.arange(SP // bm) >= (SP // bm) // 2).astype(jnp.int32)
    flops = 2 * SP * K * N

    cases = sys.argv[1:] or ["null", "bf16", "s8raw", "gmm8", "gmm_w8a8",
                             "quantrows"]

    if "null" in cases:
        # per-call overhead floor: an O(1) body in the same scan harness —
        # subtract this from every other number (the axon tunnel's
        # dispatch+fetch is ~4 ms/call and reps must amortize it)
        timeit("null", lambda: (
            lambda ops, c: ops[0][:8, :8] * c, (x,)))

    if "bf16" in cases:
        timeit("bf16", lambda: (
            lambda ops, c: jnp.dot((ops[0] * c).astype(jnp.bfloat16), ops[1],
                                   preferred_element_type=jnp.float32),
            (x, w)), flops=flops)
    if "s8raw" in cases:
        # feedback can't scale int8 input; vary via roll on the fly
        timeit("s8raw", lambda: (
            lambda ops, c: jax.lax.dot(
                jnp.roll(ops[0], c.astype(jnp.int32) % 3, axis=0), ops[1],
                preferred_element_type=jnp.int32),
            (xq, w8[0])), flops=flops)
    if "gmm8" in cases:
        timeit(f"gmm8 bm{bm} bn{bn}", lambda: (
            lambda ops, c: gmm((ops[0] * c).astype(jnp.bfloat16), ops[1],
                               tile_gid, ops[2], block_m=bm, block_n=bn),
            (x, w8, wsc)), flops=flops)
    if "gmm_w8a8" in cases:
        timeit(f"gmm_w8a8 bm{bm} bn{bn} bk{bk}", lambda: (
            lambda ops, c: gmm(jnp.roll(ops[0], c.astype(jnp.int32) % 3,
                                        axis=0), ops[1],
                               tile_gid, ops[2], a_scale=ops[3],
                               block_m=bm, block_n=bn, block_k=bk),
            (xq, w8, wsc, xsc)), flops=flops)
    if "gmm_w8a8_t" in cases:                  # down-proj shape: K=11008
        wd8 = jnp.swapaxes(w8, 1, 2)           # [E, N, K] -> contraction 11008
        wdsc = jnp.full((E, 1, K), 1 / 16, jnp.float32)
        xd = jax.random.normal(kx, (SP, N), jnp.bfloat16)
        xdq, xdsc = quantize_rows(xd)
        timeit(f"gmm_w8a8_t bm{bm} bn{bn}", lambda: (
            lambda ops, c: gmm(jnp.roll(ops[0], c.astype(jnp.int32) % 3,
                                        axis=0), ops[1],
                               tile_gid, ops[2], a_scale=ops[3],
                               block_m=bm, block_n=bn),
            (xdq, wd8, wdsc, xdsc)), flops=flops)
    if "quantrows" in cases:
        timeit("quantize_rows", lambda: (
            lambda ops, c: quantize_rows(ops[0] * c)[0],
            (x,)), flops=None)
    log("done")


if __name__ == "__main__":
    main()
