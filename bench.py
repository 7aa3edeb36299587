"""Headline benchmark: end-to-end pixel-grounding throughput (masks/sec/chip).

Measures the full flagship path on one TPU chip — CLIP ViT-L/14-336 encode,
projector, multimodal splice, LLaMA-7B-class prefill (576 image tokens +
text), greedy decode of the answer span, SAM-Med2D encode, <SEG>-driven
prompt-encode + mask-decode + postprocess — i.e. BASELINE.json config 4
(eval_seg). Random bf16 weights (throughput is weight-value independent).

Baseline constant: the reference pipeline on one H100 decodes token-by-token
through HF generate with flash-attn (model_worker.py:393-427, SURVEY.md §3.2)
at roughly 30 tok/s for a LoRA-merged 7B in fp16, plus a sequential SAM
encode+decode per sample — ~2.5 masks/s/GPU for a 10-token grounding answer.
The north star in BASELINE.json is >=3x that per v5e chip.

Default config = the FLAGSHIP: the model the reference actually
ships — MedPLIB-7b-2e, 32 layers x 2 experts (~13B params), top-1 routing,
eval capacity 2.0 — quantized int8 attention + int4h experts (the halved
expert residency buys batch 16) with the whole-stack Pallas gmm_int4h
W4A8 expert dispatch at prefill AND the fused A8 decode-step kernel
(ops/pallas/moe_decode.py — routing+SwiGLU+combine in one pallas call;
19.67 ms/step after the round-5 interleaved-pairs bitcast unpack, 0.11 ms
off the dense int8 floor; sort-free cumsum alignment, TWO-ENDED E=2
packing): 14.52 masks/s (~5.8x; round-4 halves layout measured
13.95-14.14 run-to-run on the shared axon tunnel).
BENCH_MOE_EXPERT_BITS=8 selects int8 experts (finer scales, B=8 + int8
KV — 11.13, 4.45x). BENCH_MOE=0 selects the dense LISA-style variant
(weight-only int8 + XLA W8A8 prefill, batch 16 — 16.03 masks/s, 6.4x;
the dense-model peak, not the shipped architecture). Ladder and A/B history in README "Performance"; measured
v5e dense ladder after the in-place KV-cache decode fix: int8 B=14 12.37,
int8 B=12 12.03, int8 B=16 11.8. Pre-fix history: bf16 B=2 5.2, bf16
B=3 6.3 (B=4 OOM), int8 B=8 9.1, int8 B=12 9.3-9.6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the 7B generate program takes a long time to
# compile through the remote TPU compiler; cache it across runs
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

H100_REFERENCE_MASKS_PER_SEC = 2.5  # documented estimate, see module docstring

SMALL = os.environ.get("BENCH_SMALL") == "1"


def log(msg):
    import sys, time
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _phase_timings(params, cfg, batch, max_new, actq=False):
    """BENCH_PHASES=1: time prefill / decode / grounding separately via the
    worker's stream fns (diagnostic; stderr only). Runs at a reduced batch:
    holding a live StreamState while a second one is produced needs TWO KV
    caches (8 GB each at B=12/7B), which generate() avoids by keeping the
    cache inside one donated program."""
    from medplib_tpu.models import medplib

    B = min(4, batch.input_ids.shape[0])
    small = jax.tree_util.tree_map(lambda a: a[:B], batch)

    prefill = jax.jit(lambda p, b: medplib.stream_prefill(
        p, cfg, b, max_new_tokens=max_new))
    chunk = jax.jit(lambda p, s: medplib.stream_decode_chunk(
        p, cfg, s, max_new))
    ground = jax.jit(lambda p, b, s: medplib.stream_ground(p, cfg, b, s))

    from medplib_tpu.utils.quantize import dynamic_act_quant
    with dynamic_act_quant(actq):   # trace-time flag
        state = prefill(params, small)
        _, toks, done = chunk(params, state)
        res = ground(params, small, state)
        _ = float(jnp.sum(res[0]))

    def timeit(fn, n=5):
        t0 = time.time()
        for _ in range(n):
            out = fn()
            _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(
                jnp.float32)))
        return (time.time() - t0) / n

    tp = timeit(lambda: prefill(params, small))
    td = timeit(lambda: chunk(params, state))
    tg = timeit(lambda: ground(params, small, state))
    log(f"phases@B={B}: prefill {tp*1e3:.1f}ms, "
        f"decode({max_new}) {td*1e3:.1f}ms ({td/max_new*1e3:.1f}ms/step), "
        f"ground {tg*1e3:.1f}ms; sum {(tp+td+tg)*1e3:.1f}ms")


def main():
    import __graft_entry__ as ge
    from medplib_tpu.models import medplib

    num_layers = 4 if SMALL else 32
    # DEFAULT: the FULL MedPLIB-7b-2e flagship — 32 layers x 2 experts
    # (~13B params), top-1 routing — quantized so it fits the 16 GB chip
    # (utils/quantize.quantize_flagship_moe). BENCH_MOE=0 for the dense
    # LISA-style variant.
    moe = os.environ.get("BENCH_MOE", "1") == "1"
    cfg = ge._flagship_cfg(num_layers=num_layers, moe=moe)
    rng = np.random.default_rng(0)
    log("init params..." + (" [MoE 2e]" if moe else ""))
    # jit the whole init: eager init is hundreds of small device ops, each a
    # round-trip through the axon tunnel (minutes); one fused program is secs.
    # For the MoE flagship (13B-class) the strip + quantization happen INSIDE
    # the init jit, so neither the dead dense-MLP stack nor the bf16 expert
    # stacks (8.6 GB each) are ever materialized in HBM — only the final
    # int8/int4 tree comes out.
    if moe:
        # DEFAULT expert layout: int4h (interleaved nibble pairs,
        # per-half scales — ~4.3 GB experts instead of 8.6) streamed
        # through the fused W4A8 gmm_int4h. The halved expert residency
        # buys batch 16 (int8 experts cap at 8), which is worth more than
        # int8's finer scales are: measured 12.15-12.49 masks/s vs 11.13.
        # BENCH_MOE_EXPERT_BITS=8 selects the accuracy-conservative int8
        # expert variant (W8A8 gmm prefill, B=8).
        params = ge._init_flagship_moe_quantized(
            jax.random.PRNGKey(0), cfg,
            expert_bits=int(os.environ.get("BENCH_MOE_EXPERT_BITS", "4")),
            attn_bits=int(os.environ.get("BENCH_MOE_ATTN_BITS", "8")))
    else:
        params = jax.jit(
            lambda k: medplib.init_medplib(k, cfg, jnp.bfloat16)
        )(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
    log("init done")

    # NOTE: packing is OFF by default: at 7B on 16G HBM the packed+int8
    # combination OOMs even with the Pallas int8 matmul (the wide fused
    # outputs can't fuse across the kernel boundary); pack_inference is for
    # bf16 serving or bigger-HBM chips (v5p)
    if os.environ.get("BENCH_PACK", "0") == "1":
        # fuse q/k/v and gate/up kernels: one wide matmul per pair
        from medplib_tpu.models import llama
        params["llm"] = llama.pack_inference(params["llm"])
        log("packed qkv/gateup")

    quant = os.environ.get("BENCH_QUANT", "int8")
    use_int8 = quant == "int8"
    if moe:
        # already quantized inside the init jit
        use_int8 = True
        eb = os.environ.get("BENCH_MOE_EXPERT_BITS", "4")
        log(f"quantized flagship MoE (int8 attn + int{eb}"
            f"{'h' if eb == '4' else ''} experts)")
    elif quant in ("int8", "int4"):
        # weight-only int8/int4 serving config (utils/quantize.py, the
        # bitsandbytes-equivalent path): halves/quarters LLM HBM -> bigger
        # batch + faster weight-bound decode
        from medplib_tpu.utils import quantize as qz
        params = qz.quantize_tree(params, bits=8 if use_int8 else 4)
        jax.block_until_ready(params)
        log(f"quantized {quant}")

    # default batch tracks the precision: int8 fits B=12, bf16 tops out at 3
    # (7B params + KV cache in 16G HBM, see docstring ladder)
    if moe:
        # int4h experts fit B=16 (B=18 OOMs); int8 experts cap at B=8
        eb4 = os.environ.get("BENCH_MOE_EXPERT_BITS", "4") == "4"
        B = int(os.environ.get("BENCH_B", "16" if eb4 else "8"))
    else:
        # int8 default rides the batch-16 sweet spot: 16.03 masks/s (and
        # 15.5-15.8 with int8 KV) vs 12.6 at B=14 — the pow-2 batch's
        # layouts, not cache traffic, are the lever (B=14 kvq 12.09,
        # B=18 kvq 12.63, B=20 OOMs). The round-2 "B=16 11.8" row is
        # stale: the current composed program does not reproduce it.
        B = int(os.environ.get(
            "BENCH_B", {"int8": "16", "int4": "12"}.get(quant, "3")))
    T_in = 48  # prompt tokens incl. <image> sentinel (splices to ~623)
    # typical grounding answer: "It is <SEG>." + stop. BENCH_MAXNEW=1
    # isolates prefill+ground (diagnostic: decode share by subtraction)
    max_new = int(os.environ.get("BENCH_MAXNEW", "10"))
    batch = ge._make_batch(cfg, B=B, T=T_in, rng=rng)

    unroll = os.environ.get("BENCH_UNROLL", "0") == "1"
    # W8A8: dynamic per-row activation quant on prefill matmuls (2x-rate
    # int8 MXU); decode stays weight-only (utils/quantize.dynamic_act_quant).
    # DEFAULT ON for int8: the reference's bitsandbytes int8 path also
    # quantizes activations (LLM.int8 8-bit matmul), and it measures 12.57
    # vs 12.41 weight-only at B=14. BENCH_ACTQ=0 opts out.
    actq = use_int8 and os.environ.get("BENCH_ACTQ", "1") == "1"
    if actq and not moe and os.environ.get("MEDPLIB_STACK_MLP") == "1":
        # zero-pad the dense FFN stacks (M 11008 -> 11264) so the opt-in
        # whole-stack W8A8 gmm prefill engages pad-free (ops/stacked.
        # stack_mlp_for_w8a8; measured 11.24 vs 12.62 default — kept as
        # an A/B knob, see models/llama.forward); exact, int8-in-place
        from medplib_tpu.utils import quantize as qz
        params["llm"]["layers"]["mlp"] = qz.pad_dense_mlp_for_gmm(
            params["llm"]["layers"]["mlp"])
        jax.block_until_ready(params)
        log("padded dense MLP stacks for gmm")
    # BENCH_KVQUANT=1: int8 KV cache with per-token-per-head scales — halves
    # cache HBM and decode's cache-read traffic (models/llama.KVCache).
    # Default ON only for the int8-EXPERT flagship (8.6 GB experts leave
    # no room for a bf16 cache at B=8). Whenever the bf16 cache fits, kvq
    # measures within-noise-to-slightly-slower (dense B=16: 15.45-16.03
    # without vs 15.52-15.82 with; int4h flagship B=16: 12.58 vs
    # 12.15-12.49), so it stays a capacity feature, not a speed default.
    kvq = os.environ.get(
        "BENCH_KVQUANT",
        "1" if (moe and os.environ.get("BENCH_MOE_EXPERT_BITS", "4") == "8")
        else "0") == "1"
    gen = jax.jit(
        lambda p, b: medplib.generate(p, cfg, b, max_new_tokens=max_new,
                                      unroll_layers=unroll, kv_quant=kvq))

    if os.environ.get("BENCH_PHASES") == "1" and moe:
        # holding a live StreamState + a second compiled program alongside
        # the int8 13B tree OOMs the 16 GB chip — measured RESOURCE_
        # EXHAUSTED; use benchmarks/profile_moe.py for MoE phase splits
        log("BENCH_PHASES unavailable for the MoE flagship (OOM); skipped")
    elif os.environ.get("BENCH_PHASES") == "1":
        # phases always measure the default scan path; BENCH_UNROLL only
        # affects the headline program (unroll was measured slower and is
        # kept as a ladder knob, not a phase-diagnostic one)
        _phase_timings(params, cfg, batch, max_new, actq)

    def run_once(b):
        res = gen(params, b)
        # force a host read: on the axon tunnel block_until_ready does NOT
        # synchronize with device execution, only a fetch does
        return float(jnp.sum(res.pred_masks))

    log("compiling generate..." + (" [W8A8 prefill]" if actq else ""))
    from medplib_tpu.utils.quantize import dynamic_act_quant
    with dynamic_act_quant(actq):   # flag is read at TRACE time
        run_once(batch)  # compile + warm
    log("compile done")
    iters = 3 if SMALL else 5
    # pre-build perturbed inputs OUTSIDE the timed loop: an eager .at[].set()
    # per iteration is its own dispatch through the axon tunnel and would
    # dominate the measurement
    ids = np.asarray(batch.input_ids)
    variants = []
    for i in range(iters):
        v = ids.copy()
        v[0, 5] = 100 + i  # perturb so no caching layer can elide work
        variants.append(batch._replace(input_ids=jnp.asarray(v)))
    jax.block_until_ready([v.input_ids for v in variants])
    t0 = time.time()
    for b in variants:
        run_once(b)
    dt = (time.time() - t0) / iters
    masks_per_sec = B / dt

    # single-run precision matched to the documented +/-1.3% run-to-run
    # band (README "Performance"): 2 significant decimals on the value,
    # ONE on the ratio — more digits would be noise theater
    print(json.dumps({
        "metric": ("moe_pixel_grounding_masks_per_sec_per_chip" if moe
                   else "pixel_grounding_masks_per_sec_per_chip"),
        "value": round(masks_per_sec, 2),
        "unit": "masks/s",
        "vs_baseline": round(masks_per_sec / H100_REFERENCE_MASKS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
