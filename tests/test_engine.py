"""Continuous-batching engine: batching invariance vs the single-stream
path, slot reuse under oversubscription, mixed greedy/sampled batches, and
per-request SEG grounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import MedplibConfig
from medplib_tpu.data.dataset import CollatorConfig, collate, to_model_batch
from medplib_tpu.data import tokenize as tk
from medplib_tpu.data import preprocess as pp
from medplib_tpu.models import medplib
from medplib_tpu.serve.engine import BatchedEngine


class SegTok:
    bos_token_id = 1
    pad_token_id = 0
    eos_token_id = 2
    model_max_length = 64

    def __init__(self, seg_idx):
        self.seg_idx = seg_idx

    def __call__(self, text, add_special_tokens=True):
        ids = [1] if add_special_tokens else []
        for w in text.split():
            ids.append(self.seg_idx if w == "<SEG>" else 3 + hash(w) % 300)

        class R:
            pass

        r = R()
        r.input_ids = ids
        return r


@pytest.fixture(scope="module", autouse=True)
def _fresh_caches():
    """Engine tests run threads that jit under memory pressure late in the
    full suite; dropping every prior module's compiled programs keeps host
    RAM headroom so an allocation failure inside the engine thread can't
    flake the invariance asserts."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def tiny():
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    tok = SegTok(cfg.seg_token_idx)
    cc = CollatorConfig(max_seq_len=48,
                        image_tokens=cfg.vision.num_patches,
                        sam_image_size=cfg.sam.image_size,
                        clip_image_size=cfg.vision.image_size)
    return cfg, params, tok, cc


def _make_batch(cfg, tok, cc, prompt, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (40, 56, 3)).astype(np.uint8)
    image_sam, resize_hw = pp.preprocess_sam(img, cfg.sam.image_size)
    image_clip = pp.preprocess_clip(img, cfg.vision.image_size)
    ids = tk.tokenizer_image_token(prompt, tok)
    sample = {
        "input_ids": np.asarray(ids, np.int64),
        "labels": np.full(len(ids), -100, np.int64),
        "image_clip": image_clip, "image_sam": image_sam,
        "resize_hw": resize_hw, "original_hw": img.shape[:2],
        "gt_masks": [], "gt_masks_original": [], "question": [prompt],
        "gt": [""], "image_path": None, "answer_type": None,
    }
    arrays, _ = collate([sample], cc)
    return to_model_batch(arrays)


def _reference_tokens(cfg, params, batch, budget, chunk, eos=2):
    """Single-request stream path (what the worker runs today)."""
    state = medplib.stream_prefill(params, cfg, batch,
                                   max_new_tokens=budget)
    toks = []
    steps = 0
    while steps < budget:
        state, ct, cd = medplib.stream_decode_chunk(params, cfg, state,
                                                    chunk=chunk, eos_id=eos)
        for t, d in zip(np.asarray(ct)[0], np.asarray(cd)[0]):
            if not d and int(t) > 0 and len(toks) < budget:
                toks.append(int(t))
        steps += chunk
        if bool(np.asarray(cd)[0][-1]) or bool(np.asarray(state.done)[0]):
            break
    return toks, state


PROMPTS = [
    "USER: <image>\nWhat is this? ASSISTANT:",
    "USER: <image>\nPlease segment the lesion <SEG> now ASSISTANT:",
    "USER: <image>\nDescribe the finding in detail ASSISTANT:",
    "USER: <image>\nIs there an abnormality? ASSISTANT:",
    "USER: <image>\nWhere is the organ? ASSISTANT:",
]


def test_engine_quick_equivalence(tiny):
    """Quick-tier canary (ADVICE r4): one cheap 2-slot greedy
    engine-vs-sequential equivalence so routine CI exercises the engine
    decode/admission path; the broader matrix lives in the slow tier."""
    cfg, params, tok, cc = tiny
    budget, chunk = 4, 2
    batches = [_make_batch(cfg, tok, cc, p, seed=i)
               for i, p in enumerate(PROMPTS[:2])]
    want = [_reference_tokens(cfg, params, b, budget, chunk)[0]
            for b in batches]
    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=budget,
                        chunk=chunk)
    try:
        reqs = [eng.submit(b, temperature=0.0) for b in batches]
        assert [r.tokens() for r in reqs] == want
        assert all(r.error is None for r in reqs)
    finally:
        eng.shutdown()


@pytest.mark.parametrize("group", [False, True])
@pytest.mark.slow
def test_engine_matches_single_stream_and_reuses_slots(tiny, group):
    """5 greedy requests through a 2-slot engine must each reproduce the
    sequential single-request stream token-for-token (batching invariance),
    forcing slot reuse along the way — in both admission modes."""
    cfg, params, tok, cc = tiny
    budget, chunk = 8, 4
    batches = [_make_batch(cfg, tok, cc, p, seed=i)
               for i, p in enumerate(PROMPTS)]
    want = [_reference_tokens(cfg, params, b, budget, chunk)[0]
            for b in batches]

    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=budget,
                        chunk=chunk, group_admission=group)
    try:
        reqs = [eng.submit(b, temperature=0.0) for b in batches]
        got = [r.tokens() for r in reqs]
        assert got == want
        assert all(r.error is None for r in reqs)
        assert eng.active_requests == 0
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_engine_mixed_greedy_and_sampled(tiny):
    """A greedy request batched WITH a sampled one still gets exact-argmax
    tokens (per-row temperature routing in ops/sampling.sample_token)."""
    cfg, params, tok, cc = tiny
    budget, chunk = 8, 4
    b_greedy = _make_batch(cfg, tok, cc, PROMPTS[0], seed=0)
    b_sample = _make_batch(cfg, tok, cc, PROMPTS[2], seed=1)
    want, _ = _reference_tokens(cfg, params, b_greedy, budget, chunk)

    # group_admission exercises the mixed greedy+sampled BATCHED prefill
    # (per-row temperature arrays); decode always batches the mix
    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=budget,
                        chunk=chunk, group_admission=True)
    try:
        rg = eng.submit(b_greedy, temperature=0.0)
        # no seed: a seeded sampled request would prefill solo by design
        rs = eng.submit(b_sample, temperature=0.9, top_p=0.9)
        got = rg.tokens()
        sampled = rs.tokens()
        assert got == want
        assert all(0 < t for t in sampled)
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_engine_grounding_matches_stream_ground(tiny):
    """A prompt carrying <SEG> grounds per-request; the mask must equal the
    single-stream stream_ground result."""
    cfg, params, tok, cc = tiny
    budget, chunk = 4, 4
    batch = _make_batch(cfg, tok, cc, PROMPTS[1], seed=1)
    _, ref_state = _reference_tokens(cfg, params, batch, budget, chunk)
    ref_masks, ref_valid = medplib.stream_ground(params, cfg, batch,
                                                 ref_state)

    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=budget,
                        chunk=chunk)
    try:
        r = eng.submit(batch, temperature=0.0)
        r.tokens()
        out = r.ground()
        assert out is not None
        masks, valid = out
        np.testing.assert_array_equal(np.asarray(valid),
                                      np.asarray(ref_valid))
        np.testing.assert_allclose(np.asarray(masks, np.float32),
                                   np.asarray(ref_masks, np.float32),
                                   rtol=2e-2, atol=2e-2)

        # a request with no SEG grounds to None
        r2 = eng.submit(_make_batch(cfg, tok, cc, PROMPTS[0]),
                        temperature=0.0)
        r2.tokens()
        assert r2.ground() is None
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_engine_shape_isolation_and_idle_healing(tiny):
    """While traffic is live, a request whose collation shape mismatches the
    shared state fails ALONE (in-flight requests unaffected); once the
    engine is idle, the shared state is rebuilt around whatever shape
    arrives next (shape-adaptive healing), so no shape permanently poisons
    the engine."""
    import time

    cfg, params, tok, cc = tiny
    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=8, chunk=2)
    try:
        good = _make_batch(cfg, tok, cc, PROMPTS[0])
        with pytest.raises(ValueError):
            eng.submit(jax.tree_util.tree_map(
                lambda a: np.concatenate([a, a], 0), good))
        want = _reference_tokens(cfg, params, good, 8, 2)[0]
        # a prompt collated to a DIFFERENT max_seq_len can't share KV state
        other_cc = CollatorConfig(max_seq_len=96,
                                  image_tokens=cfg.vision.num_patches,
                                  sam_image_size=cfg.sam.image_size,
                                  clip_image_size=cfg.vision.image_size)
        other = _make_batch(cfg, tok, other_cc, PROMPTS[0])

        rg = eng.submit(good, temperature=0.0)
        # wait until good occupies a slot, then race the mismatched one in
        for _ in range(400):
            if any(r is rg for r in eng._slot_req):
                break
            time.sleep(0.05)
        rb = eng.submit(other, temperature=0.0)
        assert rg.tokens() == want  # in-flight request unaffected
        if rb.error is not None:  # failed while good was live: isolated
            with pytest.raises(BaseException):
                rb.tokens()
        else:  # good finished first: idle healing admitted it instead
            assert isinstance(rb.tokens(), list)
        # idle: the mismatched shape is now accepted (state rebuilt) ...
        r2 = eng.submit(other, temperature=0.0)
        r2.tokens()
        assert r2.error is None
        # ... and switching back heals again
        assert eng.submit(good, temperature=0.0).tokens() == want
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_engine_stress_randomized_traffic(tiny):
    """12 requests with random budgets and a greedy/sampled mix, submitted
    from 3 threads with jitter through a 3-slot engine: everything must
    complete without error, and every greedy request must still match the
    sequential reference token-for-token."""
    import random as pyrandom
    import threading
    import time

    cfg, params, tok, cc = tiny
    chunk = 2
    eng = BatchedEngine(cfg, params, slots=3, max_new_tokens=8, chunk=chunk)
    rng = pyrandom.Random(0)
    jobs = []
    for i in range(12):
        prompt = PROMPTS[i % len(PROMPTS)]
        batch = _make_batch(cfg, tok, cc, prompt, seed=i)
        budget = rng.choice([2, 4, 6, 8])
        greedy = i % 3 != 2
        jobs.append((batch, budget, greedy))

    results = [None] * len(jobs)
    errors = []

    def submit_range(lo, hi):
        for j in range(lo, hi):
            batch, budget, greedy = jobs[j]
            time.sleep(pyrandom.Random(j).uniform(0, 0.1))
            r = eng.submit(batch, temperature=0.0 if greedy else 0.8,
                           top_p=0.9, max_new_tokens=budget)
            try:
                results[j] = r.tokens()
            except BaseException as e:  # noqa: BLE001
                errors.append((j, e))

    try:
        threads = [threading.Thread(target=submit_range, args=(k, k + 4))
                   for k in (0, 4, 8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        for j, (batch, budget, greedy) in enumerate(jobs):
            assert results[j] is not None
            if greedy:
                want = _reference_tokens(cfg, params, batch, budget, chunk)[0]
                assert results[j] == want[:budget], (j, results[j], want)
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_engine_prompt_buckets_and_cancel(tiny):
    """max_prompt_len engine (VERDICT round-2 task 5): requests collated at
    a NARROWER bucket are padded to the slot shape at insert and decode the
    same tokens as full-width admission; cancel() retires a slot early."""
    cfg, params, tok, cc = tiny
    cc_small = CollatorConfig(max_seq_len=24,
                              image_tokens=cfg.vision.num_patches,
                              sam_image_size=cfg.sam.image_size,
                              clip_image_size=cfg.vision.image_size)
    prompt = "USER: <image>\nshort question ASSISTANT:"
    b_small = _make_batch(cfg, tok, cc_small, prompt)
    b_full = _make_batch(cfg, tok, cc, prompt)

    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=8, chunk=4,
                        max_prompt_len=cc.max_seq_len)
    try:
        toks_small = eng.submit(b_small, temperature=0.0).tokens()
        toks_full = eng.submit(b_full, temperature=0.0).tokens()
        assert toks_small == toks_full, (toks_small, toks_full)

        # over-wide prompts are rejected up front
        cc_big = CollatorConfig(max_seq_len=64,
                                image_tokens=cfg.vision.num_patches,
                                sam_image_size=cfg.sam.image_size,
                                clip_image_size=cfg.vision.image_size)
        with pytest.raises(ValueError, match="max_prompt_len"):
            eng.submit(_make_batch(cfg, tok, cc_big, prompt))

    finally:
        eng.shutdown()

    # cancel(): stream terminates without draining the full budget. The
    # engine decodes ahead of the consumer, so cancel immediately after
    # submit and allow a few chunks of slack for the race.
    eng2 = BatchedEngine(cfg, params, slots=2, max_new_tokens=64, chunk=4,
                         max_prompt_len=cc.max_seq_len)
    try:
        req = eng2.submit(b_small, temperature=0.0)
        req.cancel()
        got = []
        for chunk_toks in req:
            got.extend(chunk_toks)
        assert len(got) <= 32, len(got)  # far short of the 64 budget
    finally:
        eng2.shutdown()


@pytest.mark.slow
def test_engine_kv_quant_matches_quantized_stream(tiny):
    """int8 KV cache in the engine (kv_quant=True): requests reproduce the
    single-stream path built on the SAME quantized cache token-for-token
    (llama.KVCache quant; VERDICT r2 #7)."""
    cfg, params, tok, cc = tiny
    budget, chunk = 8, 4
    batches = [_make_batch(cfg, tok, cc, p, seed=i)
               for i, p in enumerate(PROMPTS[:3])]

    def ref(batch):
        state = medplib.stream_prefill(params, cfg, batch,
                                       max_new_tokens=budget, kv_quant=True)
        toks, steps = [], 0
        while steps < budget:
            state, ct, cd = medplib.stream_decode_chunk(
                params, cfg, state, chunk=chunk, eos_id=2)
            for t, d in zip(np.asarray(ct)[0], np.asarray(cd)[0]):
                if not d and int(t) > 0 and len(toks) < budget:
                    toks.append(int(t))
            steps += chunk
            if bool(np.asarray(cd)[0][-1]) or bool(np.asarray(state.done)[0]):
                break
        return toks

    want = [ref(b) for b in batches]
    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=budget,
                        chunk=chunk, kv_quant=True)
    try:
        got = [r.tokens() for r in [eng.submit(b, temperature=0.0)
                                    for b in batches]]
        assert got == want
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_engine_serves_moe_model(tiny):
    """The engine serves the MoE composite (the flagship architecture)
    unchanged: decode-sized batches route through the sort dispatch and
    batched output matches the sequential stream."""
    import dataclasses

    from medplib_tpu.config import MoeConfig

    cfg, _, tok, cc = tiny
    cfg = dataclasses.replace(
        cfg, moe=MoeConfig(enable=True, num_experts=2, top_k=1,
                           capacity_factor=1.5, eval_capacity_factor=2.0,
                           moe_mode="dense"))
    params = medplib.init_medplib(jax.random.PRNGKey(3), cfg)
    budget, chunk = 6, 3
    batches = [_make_batch(cfg, tok, cc, p, seed=i)
               for i, p in enumerate(PROMPTS[:3])]
    want = [_reference_tokens(cfg, params, b, budget, chunk)[0]
            for b in batches]
    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=budget,
                        chunk=chunk)
    try:
        got = [r.tokens() for r in [eng.submit(b, temperature=0.0)
                                    for b in batches]]
        assert got == want
    finally:
        eng.shutdown()


def test_engine_first_token_fast_path(tiny):
    """The prefill's own sampled token is delivered AT ADMISSION as a
    1-token chunk (TTFT = prefill, not prefill + a full decode chunk), and
    the overall stream still matches the sequential path exactly."""
    cfg, params, tok, cc = tiny
    budget, chunk = 8, 4
    b = _make_batch(cfg, tok, cc, PROMPTS[0])
    want, _ = _reference_tokens(cfg, params, b, budget, chunk)
    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=budget,
                        chunk=chunk)
    try:
        r = eng.submit(b, temperature=0.0)
        chunks = list(r)
        assert chunks and chunks[0] == want[:1]
        assert [t for c in chunks for t in c] == want
    finally:
        eng.shutdown()


@pytest.mark.parametrize("kvq", [False, True])
@pytest.mark.slow
def test_chunked_prefill_matches_monolithic(tiny, kvq):
    """begin -> N x stream_prefill_chunk -> finish must reproduce
    stream_prefill exactly: same cache prefix, same prompt-SEG slots, same
    first token — and the decoded continuation must match token-for-token
    (bf16-KV and int8-KV extend paths both). Chunk size 5 deliberately does
    NOT divide the spliced length, so the tail-padding path is exercised."""
    cfg, params, tok, cc = tiny
    budget, C = 8, 5
    b = _make_batch(cfg, tok, cc, PROMPTS[1])  # prompt contains <SEG>
    ref = jax.jit(lambda p, bb: medplib.stream_prefill(
        p, cfg, bb, max_new_tokens=budget, kv_quant=kvq))(params, b)

    embeds, am, sm, carry = jax.jit(
        lambda p, bb: medplib.stream_prefill_begin(
            p, cfg, bb, max_new_tokens=budget, chunk_tokens=C,
            kv_quant=kvq))(params, b)
    ext = jax.jit(lambda p, ca, e, a, s, c0: medplib.stream_prefill_chunk(
        p, cfg, ca, e, a, s, c0, chunk_tokens=C))
    n = embeds.shape[1] // C
    assert embeds.shape[1] % C == 0 and n >= 2
    for ci in range(n):
        carry = ext(params, carry, embeds, am, sm, jnp.int32(ci * C))
    st = jax.jit(lambda p, ca, a: medplib.stream_prefill_finish(
        p, cfg, ca, a))(params, carry, am)

    assert int(np.asarray(st.tok)[0]) == int(np.asarray(ref.tok)[0])
    np.testing.assert_array_equal(np.asarray(st.seg_count),
                                  np.asarray(ref.seg_count))
    # int8 KV: later chunks attend QUANTIZED earlier-chunk K/V, while the
    # monolithic prefill attends unquantized — a deliberate (and tiny)
    # fidelity trade, so the quant case gets a rounding-sized tolerance
    seg_atol = 3e-2 if kvq else 1e-4
    np.testing.assert_allclose(np.asarray(st.seg_emb),
                               np.asarray(ref.seg_emb), atol=seg_atol)
    L = int(np.asarray(ref.cache.length)[0])
    assert int(np.asarray(st.cache.length)[0]) == L
    if kvq:
        def deq(c):
            return (np.asarray(c.k[:, :, :L], np.float32)
                    * np.asarray(c.k_scale[:, :, :L], np.float32))
        np.testing.assert_allclose(deq(st.cache), deq(ref.cache), atol=3e-2)
    else:
        np.testing.assert_allclose(np.asarray(st.cache.k[:, :, :L]),
                                   np.asarray(ref.cache.k[:, :, :L]),
                                   atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(st.cache.v[:, :, :L]),
                                   np.asarray(ref.cache.v[:, :, :L]),
                                   atol=2e-5, rtol=2e-5)

    dec = jax.jit(lambda p, s: medplib.stream_decode_chunk(
        p, cfg, s, chunk=budget))
    _, t_chunked, _ = dec(params, st)
    _, t_ref, _ = dec(params, ref)
    np.testing.assert_array_equal(np.asarray(t_chunked), np.asarray(t_ref))


@pytest.mark.parametrize("pc", [4, 16])
@pytest.mark.slow
def test_engine_chunked_prefill_interleaving(tiny, pc):
    """BatchedEngine(prefill_chunk=pc) must stay token-exact vs the
    sequential single-request stream while slot reuse + mid-prefill decode
    interleaving happen underneath."""
    cfg, params, tok, cc = tiny
    budget, chunk = 8, 4
    batches = [_make_batch(cfg, tok, cc, p, seed=i)
               for i, p in enumerate(PROMPTS[:3])]
    want = [_reference_tokens(cfg, params, b, budget, chunk)[0]
            for b in batches]
    eng = BatchedEngine(cfg, params, slots=2, max_new_tokens=budget,
                        chunk=chunk, prefill_chunk=pc)
    try:
        reqs = [eng.submit(b, temperature=0.0) for b in batches]
        got = [r.tokens() for r in reqs]
        assert got == want
        assert all(r.error is None for r in reqs)
        assert eng.active_requests == 0
    finally:
        eng.shutdown()
