"""Quantization fidelity budget for the flagship serving configs.

VERDICT r3 #2: the int4h-expert headline default was chosen on speed with
no fidelity evidence, and real-checkpoint Dice parity stays gated on
weights absent from this image. This harness measures what CAN be
measured today — on FIXED synthetic weights and inputs, at real depth:

  top1   next-token top-1 agreement with the reference precision over N
         teacher-forced decode steps (every variant scores the SAME token
         positions: the reference variant decodes greedily once and its
         tokens are replayed into the others)
  kl     mean per-step KL(ref || variant) of the next-token distribution
  seg    cosine similarity of the SEG-slot embedding (text_hidden_fcs of
         the prompt <SEG> position — the exact vector SAM's prompt
         encoder consumes; reference protocol MedPLIB.py:456-467)

Scales:
  8L  — bf16 reference vs {int8 attn+int8 exp, int8 attn+int4h exp}:
        the only depth where the unquantized 13B-class tree fits 16 GB,
        so the absolute bf16->quant budget is measured here.
  32L — int8 reference vs int4h experts (both int8 attn): the full
        flagship depth; bf16 does not fit, so this leg bounds the
        int8->int4h DELTA at real error-compounding depth.

Weights are identical across variants by construction (same PRNG key ->
same bf16 draws -> per-variant quantization;
__graft_entry__._init_flagship_moe_quantized).

Run: timeout 3600 python benchmarks/quant_fidelity.py [--layers 8 32]
Reference semantic ancestor: bnb 4/8-bit inference, chat.py:89-112;
BASELINE.md north-star "at Dice parity".
"""
import argparse
import json
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
    print(f"[fid {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build(num_layers: int, expert_bits: int, attn_bits: int):
    import __graft_entry__ as ge
    cfg = ge._flagship_cfg(num_layers=num_layers, moe=True)
    params = ge._init_flagship_moe_quantized(
        jax.random.PRNGKey(0), cfg, expert_bits=expert_bits,
        attn_bits=attn_bits)
    return cfg, params


def run_variant(cfg, params, ref_tokens, steps: int, B: int, T: int):
    """Prefill the fixed synthetic batch, harvest the prompt SEG
    embedding, then teacher-force `ref_tokens` ([steps, B], or None to
    decode greedily and RETURN the produced tokens). -> dict."""
    from medplib_tpu.models import llama, medplib
    from medplib_tpu.ops import splice as splice_ops
    import __graft_entry__ as ge

    batch = ge._make_batch(cfg, B=B, T=T, rng=np.random.default_rng(7))

    def prefill(p, b):
        embeds, _, attn_mask, seg_mask, _ = medplib.splice_batch(
            p, cfg, b, need_region=False)
        cache = llama.KVCache.init(cfg.llm, B,
                                   embeds.shape[1] + steps + 1,
                                   dtype=embeds.dtype)
        hidden, cache, _ = medplib._llm_forward(p, cfg, embeds, attn_mask,
                                                cache=cache, train=False)
        last_idx = jnp.maximum(jnp.sum(attn_mask, -1) - 1, 0)
        last_h = jnp.take_along_axis(hidden, last_idx[:, None, None], 1)
        logits0 = llama.logits(p["llm"], last_h)[:, 0]
        proj = medplib.text_hidden_fcs(p["text_hidden_fcs"], hidden)
        seg_emb, seg_valid, _ = splice_ops.gather_seg_embeddings(
            proj, seg_mask, 1)
        return cache, logits0, seg_emb[:, 0], seg_valid[:, 0]

    def teacher_forced(p, cache, toks):
        """toks [steps, B] inputs per step -> logits [steps, B, V]."""
        def step(c, tok):
            emb = llama.embed(p["llm"], tok[:, None])
            h, c = medplib._llm_decode(p, cfg, emb, c)
            return c, llama.logits(p["llm"], h)[:, 0]

        _, ls = jax.lax.scan(step, cache, toks)
        return ls

    t0 = time.time()
    cache, logits0, seg_emb, seg_valid = jax.jit(prefill)(params, batch)
    jax.block_until_ready(seg_emb)
    log(f"  prefill done ({time.time()-t0:.1f}s) seg_valid={np.asarray(seg_valid).tolist()}")

    if ref_tokens is None:
        # greedy reference decode to produce the replay token stream:
        # step t's INPUT token. Input 0 = argmax of the prefill logits.
        toks = [np.asarray(jnp.argmax(logits0, -1), np.int32)]
        # step-by-step host loop: ~steps axon round-trips, runs once
        cache_t = cache
        step1 = jax.jit(lambda p, c, t: _one_step(p, cfg, c, t))
        logits_list = [np.asarray(logits0)]
        for _ in range(steps - 1):
            cache_t, lg = step1(params, cache_t, jnp.asarray(toks[-1]))
            logits_list.append(np.asarray(lg))
            toks.append(np.asarray(jnp.argmax(lg, -1), np.int32))
        ref_toks = np.stack(toks)                      # [steps, B] inputs
        logits = np.stack(logits_list)                 # [steps, B, V]
        return dict(tokens=ref_toks, logits=logits,
                    seg_emb=np.asarray(seg_emb, np.float32))

    ls = jax.jit(teacher_forced)(params, cache, jnp.asarray(ref_tokens))
    logits = np.concatenate([np.asarray(logits0)[None],
                             np.asarray(ls)[:-1]], axis=0)
    return dict(tokens=None, logits=logits,
                seg_emb=np.asarray(seg_emb, np.float32))


def _one_step(p, cfg, cache, tok):
    from medplib_tpu.models import llama, medplib
    emb = llama.embed(p["llm"], tok[:, None])
    h, cache = medplib._llm_decode(p, cfg, emb, cache)
    return cache, llama.logits(p["llm"], h)[:, 0]


def compare(ref, var):
    """-> (top1 agreement, mean KL(ref||var), SEG cosine)."""
    rl, vl = ref["logits"], var["logits"]              # [S, B, V] f32
    top1 = float((rl.argmax(-1) == vl.argmax(-1)).mean())
    rp = jax.nn.log_softmax(jnp.asarray(rl), -1)
    vp = jax.nn.log_softmax(jnp.asarray(vl), -1)
    kl = float(jnp.mean(jnp.sum(jnp.exp(rp) * (rp - vp), -1)))
    a, b = ref["seg_emb"], var["seg_emb"]
    cos = float(np.mean(np.sum(a * b, -1) /
                        (np.linalg.norm(a, axis=-1)
                         * np.linalg.norm(b, axis=-1) + 1e-9)))
    return top1, kl, cos


def trained_leg(args, results):
    """Fidelity on TRAINED (peaked) logits — VERDICT r4 #2. The random-init
    legs' top-1 agreement is pessimistic when logits are flat (README
    fidelity table caveat); this leg produces the number that transfers:

      1. build the 8L flagship surrogate fully bf16 (the only depth where
         the unquantized tree fits 16 GB), inject LoRA(q,v) + sft heads,
         train --train-steps on 4 fixed synthetic batches (stage-3-shaped
         recipe; the trainer bench already shows dloss 4.85 descending);
      2. merge the adapters (utils/export merge-lora path);
      3. quantize the SAME trained weights per serving variant
         (utils/quantize.quantize_flagship_moe — exactly what a real
         checkpoint goes through) and re-run the comparison with the
         trained bf16 model as reference.
    """
    import __graft_entry__ as ge
    from medplib_tpu.config import TrainConfig
    from medplib_tpu.train import lora as lora_lib
    from medplib_tpu.train.trainer import create_state, make_train_step
    from medplib_tpu.utils import quantize as qz

    L = 8
    cfg, params = build(L, 16, 16)  # bf16 everywhere
    params["llm"] = lora_lib.inject(jax.random.PRNGKey(1), params["llm"],
                                    ("q_proj", "v_proj"), r=8)
    tcfg = TrainConfig(lr=3e-4, warmup_steps=10,
                       total_steps=args.train_steps,
                       grad_accumulation_steps=1)
    state, tx = create_state(params, tcfg)
    del params
    step = jax.jit(make_train_step(cfg, tcfg, tx), donate_argnums=(0,))
    batches = [jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (1,) + x.shape),
        ge._make_batch(cfg, B=args.train_b, T=args.train_t,
                       rng=np.random.default_rng(100 + s)))
        for s in range(4)]
    t0 = time.time()
    first = last = None
    for i in range(args.train_steps):
        state, metrics = step(state, batches[i % len(batches)])
        if i % 50 == 0 or i == args.train_steps - 1:
            last = float(metrics["loss"])
            first = last if first is None else first
            log(f"  train step {i}: loss={last:.4f}")
    log(f"  trained {args.train_steps} steps in {time.time() - t0:.0f}s "
        f"(loss {first:.3f} -> {last:.3f})")
    results["L8trained:loss_first_last"] = dict(first=first, last=last)
    merged = lora_lib.merge(state.params,
                            scale=tcfg.lora_alpha / tcfg.lora_r)
    del state, batches
    # the quantizers DONATE their bf16 input (utils/quantize._quantize_*),
    # so each variant gets a fresh device tree pushed from a host snapshot
    # — peak device residency stays one bf16 tree + one quantized tree
    merged_host = jax.tree_util.tree_map(lambda x: np.asarray(x), merged)
    del merged

    def tree_dev():
        return jax.tree_util.tree_map(lambda x: jnp.asarray(x), merged_host)

    ref = ref_tokens = None
    # bf16 trained model is the reference; int4h and int4h_a8dec share one
    # quantized tree (only the decode-kernel activation mode differs)
    for name, ebits, abits in (("bf16", 16, 16), ("int8", 8, 8),
                               ("int4h", 4, 8)):
        log(f"L={L} TRAINED variant={name}")
        qparams = tree_dev()
        if ebits < 16:
            qparams = qz.quantize_flagship_moe(qparams, expert_bits=ebits,
                                               attn_bits=abits)
        subnames = ([name] if name != "int4h"
                    else ["int4h", "int4h_a8dec"])
        for sub in subnames:
            # EXPLICIT A8 mode: the knob defaults ON in ops/moe, so the
            # plain int4h row must force it off to measure the bf16-x
            # fused path
            os.environ["MEDPLIB_DECODE_A8"] = (
                "1" if sub.endswith("_a8dec") else "0")
            try:
                out = run_variant(cfg, qparams, ref_tokens, args.steps,
                                  args.b, args.t)
            finally:
                os.environ.pop("MEDPLIB_DECODE_A8", None)
            if ref is None:
                ref, ref_tokens = out, out["tokens"]
                continue
            top1, kl, cos = compare(ref, out)
            key = f"L{L}trained:bf16->{sub}"
            results[key] = dict(top1=top1, kl=kl, seg_cos=cos)
            log(f"  {key}: top1={top1:.4f} KL={kl:.5f} seg_cos={cos:.5f}")
        del qparams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--t", type=int, default=64)
    ap.add_argument("--train-steps", type=int, default=0,
                    help="train the 8L surrogate this many steps and add "
                         "the trained-logits fidelity leg (VERDICT r4 #2)")
    ap.add_argument("--train-b", type=int, default=4)
    ap.add_argument("--train-t", type=int, default=256)
    args = ap.parse_args()
    results = {}
    for L in args.layers:
        if L == 0:  # --layers 0: trained leg only
            continue
        # *_a8dec: the fused decode kernel's s8xs8 MXU mode (per-row/
        # per-block activation quant, MEDPLIB_DECODE_A8) — the 21.1 vs
        # 23.2 ms/step decode A/B needs its OWN fidelity row
        variants = ([("bf16", 16, 16), ("int8", 8, 8), ("int4h", 4, 8),
                     ("int4h_a8dec", 4, 8)]
                    if L <= 8 else [("int8", 8, 8), ("int4h", 4, 8),
                                    ("int4h_a8dec", 4, 8)])
        ref_name = variants[0][0]
        ref = None
        ref_tokens = None
        for name, ebits, abits in variants:
            log(f"L={L} variant={name} (expert_bits={ebits}, attn_bits={abits})")
            cfg, params = build(L, ebits, abits)
            # explicit A8 mode (the knob defaults ON in ops/moe — without
            # forcing it off, "int4h" would silently measure the A8 path)
            os.environ["MEDPLIB_DECODE_A8"] = (
                "1" if name.endswith("_a8dec") else "0")
            # 32L int8+int8 leaves no room for B=4 logit capture on 16 GB
            b_eff = args.b if L <= 8 else min(args.b, 2)
            try:
                out = run_variant(cfg, params, ref_tokens, args.steps,
                                  b_eff, args.t)
            finally:
                os.environ.pop("MEDPLIB_DECODE_A8", None)
            del params
            if ref is None:
                ref, ref_tokens = out, out["tokens"]
                log(f"  reference ({ref_name}) decoded {args.steps} steps")
                continue
            top1, kl, cos = compare(ref, out)
            key = f"L{L}:{ref_name}->{name}"
            results[key] = dict(top1=top1, kl=kl, seg_cos=cos)
            log(f"  {key}: top1={top1:.4f} KL={kl:.5f} seg_cos={cos:.5f}")
    if args.train_steps:
        trained_leg(args, results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
