"""Benchmark harness for the 5 BASELINE.json configs (+ training extra).

Usage:
    python benchmarks/run_all.py                 # all configs, flagship scale
    python benchmarks/run_all.py --configs 1 4   # subset
    python benchmarks/run_all.py --tiny          # CPU smoke (CI / tests)

Each config prints one JSON line {"config", "metric", "value", "unit"}.
Timing forces a host fetch per iteration — on the axon TPU tunnel
block_until_ready does not synchronize with device execution.

Configs (BASELINE.json):
 1. CLIP ViT-L/14-336 preprocess+encode of one SA-Med2D-sized image
 2. Image-level VQA greedy decode (dense 7B path, no MoE)
 3. Region-VQA: region_fea_adapter + mm_token_compress 576->256
 4. Pixel grounding: <SEG> -> SAM-Med2D mask decode (eval_seg) — the
    flagship; the repo-root bench.py reports this one vs the H100 baseline
 5. MedPLIB-ICL: MoE 7B with in-context (image, mask) examples
 6. (extra) training-step throughput, stage-3-style seg SFT
 7. (extra) long-ICL prefill at 8k tokens (streaming flash attention)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np



def _timed(fn, *args, iters=5):
    """fn must already be jitted. Host-fetch-synced timing."""
    from medplib_tpu.utils.profiling import timed
    dt, _ = timed(fn, *args, iters=iters)
    return dt


def _report(config, metric, value, unit):
    print(json.dumps({"config": config, "metric": metric,
                      "value": round(value, 3), "unit": unit}), flush=True)


def _cfg(tiny: bool, num_layers: int, **proj):
    from medplib_tpu.config import MedplibConfig
    import __graft_entry__ as ge
    if tiny:
        cfg = MedplibConfig.tiny()
    else:
        cfg = ge._flagship_cfg(num_layers=num_layers)
    if proj:
        cfg = dataclasses.replace(
            cfg, projector=dataclasses.replace(cfg.projector, **proj))
    return cfg


def _params(cfg, dtype):
    from medplib_tpu.models import medplib
    p = jax.jit(lambda k: medplib.init_medplib(k, cfg, dtype))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(p)
    return p


def bench_clip(tiny: bool):
    """Config 1: CLIP preprocess (host, incl. native C++ path) + encode."""
    from medplib_tpu.data import preprocess as pp
    from medplib_tpu.models import clip as clipm

    cfg = _cfg(tiny, 2)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8)
    size = cfg.vision.image_size

    t0 = time.time()
    n = 20
    for _ in range(n):
        x = pp.preprocess_clip(img, size)
    pre_ms = (time.time() - t0) / n * 1e3

    params = _params(cfg, jnp.float32 if tiny else jnp.bfloat16)
    xb = jnp.asarray(x)[None]
    enc = jax.jit(lambda p, im: clipm.forward_features(p["clip"], im,
                                                       cfg.vision))
    dt = _timed(enc, params, xb)
    _report(1, "clip_preprocess", pre_ms, "ms/image")
    _report(1, "clip_encode", dt * 1e3, "ms/image")

    if not tiny:
        # device-preprocess A/B (VERDICT r3 #7): the fused on-chip
        # resize+pad+normalize (ops/device_preprocess.py, the serving
        # worker's default on TPU) vs the host path above — end-to-end
        # per image including the uint8 canvas memcpy + H2D transfer
        from medplib_tpu.ops.device_preprocess import dual_preprocess
        sam, clp, _ = dual_preprocess(img)          # compile (one bucket)
        jax.block_until_ready((sam, clp))
        t0 = time.time()
        for _ in range(n):
            sam, clp, _ = dual_preprocess(img)
            jax.block_until_ready((sam, clp))
        _report(1, "dual_preprocess_device",
                (time.time() - t0) / n * 1e3, "ms/image")
        # host dual (SAM+CLIP) for the same contract, same image
        t0 = time.time()
        for _ in range(n):
            pp.preprocess_sam(img, 256)
            pp.preprocess_clip(img, size)
        _report(1, "dual_preprocess_host",
                (time.time() - t0) / n * 1e3, "ms/image")


def _vqa_batch(cfg, B, T, n_seg=0, region=False):
    import __graft_entry__ as ge
    from medplib_tpu.config import REGION_TOKEN_INDEX
    from medplib_tpu.models.medplib import image_tokens_per_image
    rng = np.random.default_rng(0)
    batch = ge._make_batch(cfg, B=B, T=T, rng=rng)
    # with the 576->256 compressor, the image sentinel expands to the
    # COMPRESSED token count (medplib.image_tokens_per_image)
    batch = batch._replace(image_token_lengths=jnp.full_like(
        batch.image_token_lengths, image_tokens_per_image(cfg)))
    ids = np.array(batch.input_ids)  # writable copy
    if n_seg == 0:  # plain VQA: no SEG token in the prompt
        ids[:, T - 3] = 9
    if region:
        ids[:, 4] = REGION_TOKEN_INDEX
        g = int(round(cfg.vision.num_patches ** 0.5))
        rm = np.zeros((B, 1, g, g), np.float32)
        rm[:, :, : max(1, g // 3), : max(1, g // 3)] = 1.0
        batch = batch._replace(
            region_masks=jnp.asarray(rm),
            region_valid=jnp.ones_like(batch.region_valid))
    return batch._replace(input_ids=jnp.asarray(ids))


def bench_vqa(tiny: bool):
    """Config 2: image-level VQA greedy decode, dense path."""
    from medplib_tpu.models import medplib
    cfg = _cfg(tiny, 32)
    params = _params(cfg, jnp.float32 if tiny else jnp.bfloat16)
    B, T, new = (2, 16, 4) if tiny else (2, 48, 32)
    batch = _vqa_batch(cfg, B, T)
    gen = jax.jit(lambda p, b: medplib.generate(p, cfg, b, ground=False,
                                                max_new_tokens=new))
    dt = _timed(gen, params, batch)
    _report(2, "vqa_decode_throughput", B * new / dt, "tok/s")
    _report(2, "vqa_latency", dt * 1e3 / B, "ms/sample")

    # p50 TTFT (BASELINE.json headline metric): a single request's time to
    # FIRST token = the serving stream's jitted prefill, which returns the
    # first generated token in state.tok
    b1 = jax.tree_util.tree_map(lambda a: a[:1], batch)
    prefill = jax.jit(lambda p, b: medplib.stream_prefill(
        p, cfg, b, max_new_tokens=new))
    state = prefill(params, b1)
    _ = int(np.asarray(state.tok)[0])  # compile + sync
    times = []
    for _i in range(9):
        t0 = time.time()
        state = prefill(params, b1)
        _ = int(np.asarray(state.tok)[0])  # host fetch = real sync on axon
        times.append(time.time() - t0)
    _report(2, "vqa_ttft_p50", sorted(times)[len(times) // 2] * 1e3, "ms")


def bench_region(tiny: bool):
    """Config 3: region-VQA with region adapter + 576->256 compressor."""
    from medplib_tpu.models import medplib
    cfg = _cfg(tiny, 32, token_compress=True, region_adapter=True)
    cfg = dataclasses.replace(cfg, projector=dataclasses.replace(
        cfg.projector,
        compress_tokens=min(cfg.projector.compress_tokens,
                            cfg.vision.num_patches)))
    params = _params(cfg, jnp.float32 if tiny else jnp.bfloat16)
    B, T, new = (2, 16, 4) if tiny else (2, 48, 16)
    batch = _vqa_batch(cfg, B, T, region=True)
    gen = jax.jit(lambda p, b: medplib.generate(p, cfg, b, rp_flag=True,
                                                ground=False,
                                                max_new_tokens=new))
    dt = _timed(gen, params, batch)
    _report(3, "region_vqa_latency", dt * 1e3 / B, "ms/sample")


def bench_seg(tiny: bool):
    """Config 4: pixel grounding — the dense serving config (int8
    weight-only + W8A8 prefill at the B=16 sweet spot, `BENCH_MOE=0
    python bench.py` equivalent; bench.py's DEFAULT covers the MoE
    flagship variant of this metric)."""
    from medplib_tpu.models import medplib
    from medplib_tpu.utils.quantize import dynamic_act_quant
    cfg = _cfg(tiny, 32)
    params = _params(cfg, jnp.float32 if tiny else jnp.bfloat16)
    if not tiny:
        from medplib_tpu.utils import quantize as qz
        params = qz.quantize_tree(params)
        jax.block_until_ready(params)
    B, T, new = (2, 16, 4) if tiny else (16, 48, 10)
    import __graft_entry__ as ge
    batch = ge._make_batch(cfg, B=B, T=T, rng=np.random.default_rng(0))
    gen = jax.jit(lambda p, b: medplib.generate(p, cfg, b,
                                                max_new_tokens=new))
    with dynamic_act_quant(not tiny):   # trace-time flag (W8A8 prefill)
        dt = _timed(gen, params, batch)
    _report(4, "pixel_grounding", B / dt, "masks/s")


def bench_icl(tiny: bool):
    """Config 5: MoE + 2 in-context (image, mask) example pairs — FULL
    depth (32L x 2 experts, the shipped MedPLIB-7b-2e architecture),
    quantized int8 attn + int4h experts to fit 16 GB HBM
    (utils/quantize.quantize_flagship_moe)."""
    from medplib_tpu.config import IMAGE_TOKEN_INDEX, MoeConfig
    from medplib_tpu.models import medplib
    cfg = _cfg(tiny, 32 if not tiny else 2)
    cfg = dataclasses.replace(
        cfg, icl_enable=True,
        moe=MoeConfig(enable=True, num_experts=2, top_k=1,
                      capacity_factor=1.5, eval_capacity_factor=2.0,
                      moe_mode="dense"))
    if tiny:
        params = _params(cfg, jnp.float32)
    else:
        # quantized layer-by-layer init: the bf16 13B tree never
        # materializes (__graft_entry__._init_flagship_moe_quantized).
        # BENCH_ICL_EXPERT_BITS=4 selects int4h experts: at B=1 each of
        # the 10 decode steps re-reads the whole expert stack, so halving
        # expert residency (8.6 -> 4.3 GB) is a decode-bandwidth A/B.
        import __graft_entry__ as ge
        params = ge._init_flagship_moe_quantized(
            jax.random.PRNGKey(0), cfg,
            expert_bits=int(os.environ.get("BENCH_ICL_EXPERT_BITS", "8")))
    # B=4 (VERDICT r3 #9): the batched ICL regime — ragged per-example
    # images ride the padded collator slots (3 static image slots/sample,
    # data/icl_dataset.collate_icl), so batching is the same static-shape
    # program at a wider leading dim. BENCH_ICL_B=1 recovers the
    # single-request latency shape.
    B, T, new = (1, 24, 2) if tiny else (
        int(os.environ.get("BENCH_ICL_B", "4")), 64, 10)
    n_img = 3  # query + 2 icl example images
    rng = np.random.default_rng(0)
    vs, ss = cfg.vision.image_size, cfg.sam.image_size
    ids = rng.integers(3, cfg.llm.vocab_size, size=(B, T))
    ids[:, 0] = 1
    for k in range(n_img):
        ids[:, 2 + 2 * k] = IMAGE_TOKEN_INDEX
    ids[:, T - 3] = cfg.seg_token_idx
    batch = medplib.Batch.make(
        input_ids=jnp.asarray(ids),
        input_mask=jnp.ones((B, T), jnp.int32),
        labels=jnp.asarray(ids),
        images_clip=jnp.asarray(rng.normal(
            size=(B, n_img, vs, vs, 3)).astype(np.float32)),
        images_sam=jnp.asarray(rng.uniform(
            0, 255, size=(B, ss, ss, 3)).astype(np.float32)),
        image_token_lengths=jnp.full((B, n_img), cfg.vision.num_patches,
                                     jnp.int32),
        gt_masks=jnp.asarray((rng.uniform(size=(B, 1, ss, ss)) > 0.5)
                             .astype(np.float32)),
        mask_valid=jnp.ones((B, 1), bool),
        sam_frame=ss,
    )
    gen = jax.jit(lambda p, b: medplib.generate(p, cfg, b,
                                                max_new_tokens=new))
    dt = _timed(gen, params, batch)
    _report(5, "icl_moe_latency", dt * 1e3 / B, "ms/sample")


def bench_train(tiny: bool):
    """Config 6 (extra): FULL-DEPTH (32L) stage-3-style QLoRA training on
    one chip — frozen int8 7B base + bf16 LoRA adapters + sft heads,
    remat (the single-chip analog of train_stage3.sh; the partitioned
    train step differentiates only trainable leaves, train/trainer.py).
    Reports tok/s and the training loss for a finiteness check."""
    from medplib_tpu.config import TrainConfig
    from medplib_tpu.train import lora as lora_lib
    from medplib_tpu.train.trainer import create_state, make_train_step
    cfg = _cfg(tiny, 2 if tiny else 32)
    dtype = jnp.float32 if tiny else jnp.bfloat16
    params = _params(cfg, dtype)
    if not tiny:
        from medplib_tpu.utils import quantize as qz
        params["llm"] = qz.quantize_tree(params["llm"])
        jax.block_until_ready(params)
    params["llm"] = lora_lib.inject(jax.random.PRNGKey(1), params["llm"],
                                    ("q_proj", "v_proj"), r=8)
    # STAGE-3-SHAPED by default (VERDICT r3 #5): the reference stage-3
    # recipe is bs 32/GPU at ctx >= 512 (train_stage3.sh:7-37); B=8/T=512
    # (spliced ~1087 tokens/sample with the image) is the largest
    # single-chip analog that fits 16 GB with remat + donation.
    # BENCH_TRAIN_B/T override; BENCH_TRAIN_STEPS=50 adds the descent run.
    B, T = (2, 16) if tiny else (
        int(os.environ.get("BENCH_TRAIN_B", "8")),
        int(os.environ.get("BENCH_TRAIN_T", "512")))
    import __graft_entry__ as ge
    batch = ge._make_batch(cfg, B=B, T=T, rng=np.random.default_rng(0))
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (1,) + x.shape), batch)
    tcfg = TrainConfig(lr=1e-4, warmup_steps=1, total_steps=100,
                       grad_accumulation_steps=1)
    state, tx = create_state(params, tcfg)
    # DONATE the state and thread it through the timing loop: an undonated
    # step holds two copies of the int8 base + towers (~10 GB) — measured
    # OOM at 32L on the 16 GB chip
    step = jax.jit(make_train_step(cfg, tcfg, tx), donate_argnums=(0,))
    state, metrics = step(state, batches)          # compile + warm
    loss = float(metrics["loss"])                  # host fetch = axon sync
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batches)
        loss = float(metrics["loss"])
    dt = (time.time() - t0) / iters
    toks = B * (T - 1 + cfg.vision.num_patches)
    _report(6, "train_step_throughput", toks / dt, "tok/s")
    _report(6, "train_loss_finite", float(np.isfinite(loss)), "bool")
    if not tiny:
        # train MFU: QLoRA backward ~ 3x the forward matmul FLOPs (fwd +
        # remat-recompute + dL/dx chain; frozen dW skipped, LoRA dW
        # negligible) on the spliced token count
        from medplib_tpu.utils import profiling as prof
        seq = T - 1 + cfg.vision.num_patches
        fpt = 3.0 * prof.llama_flops_per_token(
            cfg.llm.hidden_size, cfg.llm.num_layers,
            cfg.llm.intermediate_size, cfg.vocab_size_padded, seq)
        _report(6, "train_mfu", prof.mfu(toks / dt, fpt), "frac")
    steps = int(os.environ.get("BENCH_TRAIN_STEPS", "0"))
    if steps:
        # synthetic descent run: one fixed batch, smoothed loss must fall
        # monotonically (LoRA + heads actually learn through the frozen
        # quantized base)
        losses = []
        for _ in range(steps):
            state, metrics = step(state, batches)
            losses.append(float(metrics["loss"]))
        k = max(5, steps // 10)
        smooth = np.convolve(losses, np.ones(k) / k, mode="valid")
        mono = bool(np.all(np.diff(smooth) <= 1e-4))
        _report(6, "train_loss_descent_monotone", float(mono), "bool")
        _report(6, "train_loss_first_last",
                round(losses[0] - losses[-1], 4), "delta")


def bench_long_context(tiny: bool):
    """Config 7 (extra): 8k-token prefill throughput at FULL depth (32L,
    int8 weights + W8A8) — the 3-shot separate ICL regime
    (infer_medplib_icl.sh:32-34 suggests ctx 8192); exercises the streaming
    flash-attention kernel (ops/pallas/flash_attention.py)."""
    from medplib_tpu.models import llama
    from medplib_tpu.config import LlamaConfig
    if tiny:
        cfg, B, T = LlamaConfig.tiny(), 1, 256
    else:
        cfg, B, T = LlamaConfig(num_layers=32), 1, 8192
    dtype = jnp.float32 if tiny else jnp.bfloat16
    params = jax.jit(lambda k: llama.init_llama(k, cfg, dtype))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if not tiny:
        from medplib_tpu.utils import quantize as qz
        params = qz.quantize_tree(params)
        jax.block_until_ready(params)
    x = jax.random.randint(jax.random.PRNGKey(1), (B, T), 3, 1000)
    mask = jnp.ones((B, T), jnp.int32)

    def prefill(p, ids):
        emb = llama.embed(p, ids)
        h, _, _ = llama.forward(p, cfg, emb, mask)
        return h

    dt = _timed(jax.jit(prefill), params, x)
    _report(7, "long_icl_prefill", B * T / dt, "tok/s")


def bench_engine(tiny: bool):
    """Config 8 (extra): continuous-batching serving throughput
    (serve/engine.py) — concurrent VQA requests coalesced into one decode
    batch, vs the reference worker's strictly sequential semaphore loop
    (model_worker.py:577-592)."""

    import __graft_entry__ as ge
    from medplib_tpu.serve.engine import BatchedEngine

    moe_eng = os.environ.get("BENCH_ENGINE_MOE", "0") == "1" and not tiny
    if tiny:
        cfg = _cfg(True, 2)
        params = _params(cfg, jnp.float32)
        slots, n_req, new, T = 2, 4, 8, 16
    elif moe_eng:
        # BENCH_ENGINE_MOE=1: serve the SHIPPED flagship (32L x 2 experts)
        # through the continuous-batching engine — int8 attn + int4h
        # experts (the capacity layout), int8 KV for slot headroom.
        # 12 slots is the measured sweet spot AND the HBM ceiling: the
        # per-step expert read amortizes over rows (100.2 tok/s at 8 ->
        # 132.2 at 12); 16 slots' wider KV cache OOMs 16 GB
        cfg = ge._flagship_cfg(num_layers=32, moe=True)
        params = ge._init_flagship_moe_quantized(jax.random.PRNGKey(0), cfg,
                                                 expert_bits=4)
        slots, n_req, new, T = 12, 24, 32, 48
        slots = int(os.environ.get("BENCH_ENGINE_SLOTS", slots))
        n_req = max(n_req, 2 * slots)
    else:
        cfg = _cfg(False, 32)
        params = _params(cfg, jnp.bfloat16)
        from medplib_tpu.utils import quantize as qz
        params = qz.quantize_tree(params)  # int8 serving config
        jax.block_until_ready(params)
        slots, n_req, new, T = 8, 16, 32, 48
        # int8 KV (BENCH_ENGINE_KVQ=1) halves per-slot cache HBM — the
        # headroom that lets BENCH_ENGINE_SLOTS=16 fit (VERDICT r2 #7)
        slots = int(os.environ.get("BENCH_ENGINE_SLOTS", slots))
        n_req = max(n_req, 2 * slots)

    rng = np.random.default_rng(0)
    kvq = (os.environ.get("BENCH_ENGINE_KVQ", "1" if moe_eng else "0")
           == "1" and not tiny)

    def mk_batch(i):
        b = ge._make_batch(cfg, B=1, T=T, rng=rng)
        ids = np.array(b.input_ids)
        ids[0, 5] = 100 + i  # distinct prompts
        ids[0, T - 3] = 7    # no SEG: pure decode path (VQA serving)
        return b._replace(input_ids=jnp.asarray(ids))

    group = os.environ.get("BENCH_ENGINE_GROUP", "0") == "1"
    # BENCH_ENGINE_PREFILL_CHUNK=N: chunked-prefill interleaving — decode
    # keeps running between prefill extends instead of stalling all slots
    # for each admission's monolithic prefill
    pc = int(os.environ.get("BENCH_ENGINE_PREFILL_CHUNK", "0")) or None
    eng = BatchedEngine(cfg, params, slots=slots, max_new_tokens=new,
                        chunk=8, group_admission=group, kv_quant=kvq,
                        prefill_chunk=pc)
    try:
        # deterministically warm every admission bucket's prefill compile
        # (padded power-of-2 groups), plus empty-state/insert/decode, so the
        # timed wave never compiles
        b1 = mk_batch(999)
        bucket = 1
        while bucket <= slots:
            t = np.zeros((bucket, 1), np.float32)
            tp = np.ones((bucket, 1), np.float32)
            jax.block_until_ready(eng._prefills[(False, False)](
                eng.params, t, tp, jax.random.PRNGKey(0), *([b1] * bucket)))
            bucket *= 2
        for r in [eng.submit(mk_batch(1000 + i), temperature=0.0)
                  for i in range(2)]:
            r.tokens()
        t0 = time.time()
        reqs = [eng.submit(mk_batch(i), temperature=0.0)
                for i in range(n_req)]
        toks = sum(len(r.tokens()) for r in reqs)
        dt = time.time() - t0
    finally:
        eng.shutdown()
    _report(8, "serving_engine_throughput", toks / dt, "tok/s")
    _report(8, "serving_engine_requests", n_req / dt, "req/s")


def bench_ttft_buckets(tiny: bool):
    """Config 9 (extra): prompt-shape buckets (serve/worker.py) — TTFT for
    a 40-token VQA prompt collated at the 128 bucket vs the legacy fixed
    512 width (same weights, same int8 serving config)."""
    from medplib_tpu.models import medplib
    cfg = _cfg(tiny, 2 if tiny else 32)
    params = _params(cfg, jnp.float32 if tiny else jnp.bfloat16)
    if not tiny:
        from medplib_tpu.utils import quantize as qz
        params = qz.quantize_tree(params)
        jax.block_until_ready(params)
    prefill = jax.jit(lambda p, b: medplib.stream_prefill(
        p, cfg, b, max_new_tokens=32))
    for T in ((16, 24) if tiny else (128, 512)):
        batch = _vqa_batch(cfg, 1, 40 if not tiny else 8)
        pad = T - batch.input_ids.shape[1]
        batch = batch._replace(
            input_ids=jnp.pad(batch.input_ids, ((0, 0), (0, pad))),
            input_mask=jnp.pad(batch.input_mask, ((0, 0), (0, pad))),
            labels=jnp.pad(batch.labels, ((0, 0), (0, pad)),
                           constant_values=-100))
        state = prefill(params, batch)
        _ = int(np.asarray(state.tok)[0])  # compile + sync
        times = []
        for _i in range(7):
            t0 = time.time()
            state = prefill(params, batch)
            _ = int(np.asarray(state.tok)[0])
            times.append(time.time() - t0)
        _report(9, f"ttft_p50_bucket_{T}",
                sorted(times)[len(times) // 2] * 1e3, "ms")


def bench_ttft_load(tiny: bool):
    """Config 10 (VERDICT r3 #4): p50/p99 TTFT measured UNDER LOAD — the
    engine keeps (slots-1) long decodes running while probe requests
    stream in; each probe's TTFT = submit() -> first chunk at the client.
    This is the loaded counterpart of config 2/9's idle TTFT and covers
    the reference worker's concurrency surface (model_worker.py:577-592
    semaphore). Also reports the decode-stall bound: the longest gap
    between consecutive chunk deliveries of a BACKGROUND request during
    probe admissions, in decode-chunk units — the number that decides
    whether chunked prefill interleaving is needed (>1 chunk = stall)."""
    import threading

    import __graft_entry__ as ge
    from medplib_tpu.serve.engine import BatchedEngine

    if tiny:
        cfg = _cfg(True, 2)
        params = _params(cfg, jnp.float32)
        slots, new, T, probes = 2, 64, 16, 3
    else:
        cfg = _cfg(False, 32)
        params = _params(cfg, jnp.bfloat16)
        from medplib_tpu.utils import quantize as qz
        params = qz.quantize_tree(params)
        jax.block_until_ready(params)
        slots = int(os.environ.get("BENCH_TTFT_SLOTS", "8"))
        # BENCH_TTFT_T widens the PROMPT (spliced length ~= T + 575): at
        # T=48 the prefill is ~1 decode chunk and chunking has nothing to
        # slice; long-prompt deployments (ICL) are where it pays
        new, T, probes = 512, int(os.environ.get("BENCH_TTFT_T", "48")), 12

    rng = np.random.default_rng(0)

    def mk_batch(i, width=T):
        b = ge._make_batch(cfg, B=1, T=width, rng=rng)
        ids = np.array(b.input_ids)
        ids[0, 5] = 100 + i
        ids[0, width - 3] = 7
        return b._replace(input_ids=jnp.asarray(ids))

    # BENCH_TTFT_PREFILL_CHUNK=<tokens> turns on chunked-prefill
    # interleaving (serve/engine.py): an admission's ~620-token spliced
    # prefill is split into extends with a shared-batch decode chunk
    # between them — the knob that shrinks bg_decode_stall_max_chunks
    pc = int(os.environ.get("BENCH_TTFT_PREFILL_CHUNK", "0")) or None
    eng = BatchedEngine(cfg, params, slots=slots, max_new_tokens=new,
                        chunk=8, kv_quant=not tiny, prefill_chunk=pc)
    try:
        warm = eng.submit(mk_batch(0), temperature=0.0,
                          max_new_tokens=8)
        warm.tokens()   # compile prefill/insert/decode before timing

        # background load: slots-1 long decodes; record their chunk
        # arrival gaps to expose probe-admission stalls. Gaps are only
        # counted once the PROBE phase starts (probe_t0) — the bg ramp-up
        # wave (the last of slots-1 serialized admissions waits behind all
        # earlier ones for its first chunk) is an artifact of the wave
        # submit, not a serving stall, and it previously dominated the max
        gaps = []
        probe_t0 = [float("inf")]
        started = set()

        def consume(r):
            last = time.time()
            first = True
            for _ in r:
                now = time.time()
                if first:
                    started.add(id(r))
                    first = False
                if last >= probe_t0[0]:
                    gaps.append(now - last)
                last = now

        bg = [eng.submit(mk_batch(1 + i), temperature=0.0,
                         max_new_tokens=new)
              for i in range(slots - 1)]
        threads = [threading.Thread(target=consume, args=(r,), daemon=True)
                   for r in bg]
        for t in threads:
            t.start()
        time.sleep(0.5)  # load reaches steady decode
        ramp_deadline = time.time() + 300
        while len(started) < slots - 1:
            # bounded ramp wait: a bg stream that errors or ends before its
            # first token never registers in `started` — fail loudly instead
            # of hanging the bench forever
            dead = [r for r in bg if getattr(r, "error", None)]
            if dead:
                raise RuntimeError(
                    f"{len(dead)} background stream(s) errored during ramp: "
                    f"{dead[0].error}")
            if time.time() > ramp_deadline:
                raise RuntimeError(
                    f"load ramp stalled: {len(started)}/{slots - 1} bg "
                    "streams delivered a first token within 300 s")
            time.sleep(0.2)  # every bg stream delivering (ramp complete)
        probe_t0[0] = time.time()

        ttfts = []
        for i in range(probes):
            t0 = time.time()
            r = eng.submit(mk_batch(100 + i), temperature=0.0,
                           max_new_tokens=16)
            for _first in r:
                ttfts.append(time.time() - t0)
                break
            r.cancel()
            r.tokens()
        for r in bg:
            r.cancel()
        for t in threads:
            t.join(timeout=60)
    finally:
        eng.shutdown()
    ttfts.sort()
    _report(10, f"ttft_p50_loaded_{slots}slots", ttfts[len(ttfts) // 2]
            * 1e3, "ms")
    _report(10, f"ttft_p99_loaded_{slots}slots", ttfts[-1] * 1e3, "ms")
    if gaps:
        # steady-state chunk period ~= median gap; stall bound in chunks.
        # ALSO absolute: the ratio's denominator shifts when interleaved
        # short chunks add many small gaps, so the ms number is the
        # comparable one across prefill_chunk modes
        gaps.sort()
        period = gaps[len(gaps) // 2]
        _report(10, "bg_decode_stall_max_chunks",
                gaps[-1] / max(period, 1e-6), "chunks")
        _report(10, "bg_decode_stall_max", gaps[-1] * 1e3, "ms")


BENCHES = {1: bench_clip, 2: bench_vqa, 3: bench_region, 4: bench_seg,
           5: bench_icl, 6: bench_train, 7: bench_long_context,
           8: bench_engine, 9: bench_ttft_buckets, 10: bench_ttft_load}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, nargs="*",
                    default=sorted(BENCHES))
    ap.add_argument("--tiny", action="store_true",
                    help="tiny configs on CPU (smoke test)")
    args = ap.parse_args(argv)
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache only for the (slow) TPU programs — mixing
        # CPU AOT entries in triggers cross-machine feature warnings
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    for c in args.configs:
        BENCHES[c](args.tiny)


if __name__ == "__main__":
    main()
