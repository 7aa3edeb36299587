"""Sampling (temperature/top-p) and multi-SEG generation tests.

Reference semantics: the serving worker routes temperature < 1e-4 to argmax
and otherwise multinomial-samples softmax(logits/temperature)
(/root/reference/model/serve/model_worker.py:420-425); top_p is a parsed
request param (288-289). Multi-SEG: model_forward decodes one mask per SEG
token (/root/reference/model/MedPLIB.py:473-502).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from medplib_tpu.config import MedplibConfig
from medplib_tpu.models import llama, medplib
from medplib_tpu.ops import sampling


def test_low_temperature_matches_greedy():
    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 64)) * 3.0
    greedy = jnp.argmax(logits, -1)
    for seed in range(5):
        got = sampling.sample_token(jax.random.PRNGKey(seed), logits,
                                    temperature=1e-3, top_p=1.0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(greedy))


def test_top_p_restricts_support():
    """top_p=0.6 over probs [.5,.3,.1,.05,.05] keeps exactly {0,1} (token k
    kept iff mass before it < top_p; top-1 always kept)."""
    probs = jnp.array([0.5, 0.3, 0.1, 0.05, 0.05])
    logits = jnp.log(probs)[None, :]
    draws = jax.vmap(lambda k: sampling.sample_token(
        k, logits, temperature=1.0, top_p=0.6)[0])(
        jax.random.split(jax.random.PRNGKey(0), 300))
    support = set(np.asarray(draws).tolist())
    assert support == {0, 1}, support
    # renormalized nucleus: p(0)/p(1) = 5/3; crude frequency check
    frac0 = float(np.mean(np.asarray(draws) == 0))
    assert 0.5 < frac0 < 0.75, frac0


def test_top_p_one_is_plain_temperature_sampling():
    """top_p=1.0 must not filter anything: empirical distribution over a
    3-token vocab approaches softmax(logits/T)."""
    logits = jnp.array([[1.0, 0.0, -1.0]])
    t = 2.0
    want = np.asarray(jax.nn.softmax(logits[0] / t))
    draws = jax.vmap(lambda k: sampling.sample_token(
        k, logits, temperature=t, top_p=1.0)[0])(
        jax.random.split(jax.random.PRNGKey(7), 2000))
    hist = np.bincount(np.asarray(draws), minlength=3) / 2000.0
    np.testing.assert_allclose(hist, want, atol=0.05)


def test_generate_sampling_paths():
    """do_sample with tiny temperature reproduces greedy token-for-token;
    high temperature with different seeds diversifies output."""
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    batch = ge._make_batch(cfg, B=2, T=12, rng=np.random.default_rng(0))
    greedy = medplib.generate(params, cfg, batch, max_new_tokens=6,
                              eos_id=-1)
    near0 = medplib.generate(params, cfg, batch, max_new_tokens=6, eos_id=-1,
                             do_sample=True, temperature=1e-3, top_p=1.0,
                             rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(greedy.output_ids),
                                  np.asarray(near0.output_ids))

    hot = [medplib.generate(params, cfg, batch, max_new_tokens=6, eos_id=-1,
                            do_sample=True, temperature=8.0, top_p=1.0,
                            rng=jax.random.PRNGKey(s)) for s in (1, 2)]
    a, b = (np.asarray(h.output_ids) for h in hot)
    assert not np.array_equal(a, b), "seeds produced identical hot samples"
    assert not np.array_equal(a, np.asarray(greedy.output_ids))


def test_streaming_sampling_matches_generate():
    """The streamed sampling path replays generate()'s sampled tokens when
    fed the same RNG key (same split schedule)."""
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    batch = ge._make_batch(cfg, B=1, T=12, rng=np.random.default_rng(1))
    kw = dict(do_sample=True, temperature=2.0, top_p=0.9,
              rng=jax.random.PRNGKey(9))
    base = medplib.generate(params, cfg, batch, max_new_tokens=6, eos_id=-1,
                            **kw)
    state = medplib.stream_prefill(params, cfg, batch, max_new_tokens=6,
                                   **kw)
    toks = []
    for _ in range(3):
        state, t, _ = medplib.stream_decode_chunk(
            params, cfg, state, chunk=2, eos_id=-1, do_sample=True,
            temperature=2.0, top_p=0.9)
        toks.append(np.asarray(t))
    np.testing.assert_array_equal(np.concatenate(toks, 1),
                                  np.asarray(base.output_ids))


# ---------------------------------------------------------------------------
# multi-SEG
# ---------------------------------------------------------------------------

def test_seg_slot_write_fills_in_order():
    emb = jnp.zeros((2, 2, 3))
    cnt = jnp.zeros((2,), jnp.int32)
    c0 = jnp.ones((2, 3))
    emb, cnt = medplib._seg_slot_write(emb, cnt, c0,
                                       jnp.array([True, False]))
    emb, cnt = medplib._seg_slot_write(emb, cnt, c0 * 2,
                                       jnp.array([True, True]))
    emb, cnt = medplib._seg_slot_write(emb, cnt, c0 * 3,
                                       jnp.array([True, False]))  # row0 full
    np.testing.assert_array_equal(np.asarray(cnt), [2, 1])
    np.testing.assert_allclose(np.asarray(emb[0]), [[1, 1, 1], [2, 2, 2]])
    np.testing.assert_allclose(np.asarray(emb[1]), [[2, 2, 2], [0, 0, 0]])


def test_multi_seg_generation_distinct_masks():
    """Two generated <SEG> tokens produce two distinct masks, each decoded
    from the hidden state of the step that predicted that SEG (verified by a
    full-forward replay)."""
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    batch = ge._make_batch(cfg, B=1, T=12, rng=np.random.default_rng(3))
    ids = np.array(batch.input_ids)
    ids[ids == cfg.seg_token_idx] = 7  # no prompt SEG
    batch = batch._replace(input_ids=jnp.asarray(ids))

    out = np.asarray(medplib.generate(params, cfg, batch, max_new_tokens=10,
                                      eos_id=-1).output_ids)[0]
    vals, counts = np.unique(out, return_counts=True)
    seg_tok = int(vals[np.argmax(counts)])
    assert counts.max() >= 2, "tiny model produced no repeated token"
    occ = [i for i, t in enumerate(out) if int(t) == seg_tok]

    cfg2 = dataclasses.replace(cfg, seg_token_idx=seg_tok)
    res = medplib.generate(params, cfg2, batch, max_new_tokens=10, eos_id=-1,
                           max_segs=2)
    # greedy output unchanged by SEG capture
    np.testing.assert_array_equal(np.asarray(res.output_ids)[0], out)
    assert np.asarray(res.seg_valid)[0].tolist() == [True, True]
    m0, m1 = np.asarray(res.pred_masks)[0]
    assert not np.allclose(m0, m1), "multi-SEG slots decoded identical masks"

    # replay: hidden state that predicted out[i] sits at position L-1+i of
    # [spliced prompt; embedded out[:i]]
    embeds, _, attn_mask, _, _ = medplib.splice_batch(params, cfg2, batch,
                                                      need_region=False)
    gen_emb = llama.embed(params["llm"], jnp.asarray(out[:-1])[None])
    full = jnp.concatenate([embeds, gen_emb], axis=1)
    mask = jnp.concatenate(
        [attn_mask, jnp.ones((1, len(out) - 1), attn_mask.dtype)], axis=1)
    hidden, _, _ = medplib._llm_forward(params, cfg2, full, mask, train=False)
    L = embeds.shape[1]
    states = jnp.stack([hidden[0, L - 1 + i] for i in occ[:2]])[None]
    seg_emb = medplib.text_hidden_fcs(params["text_hidden_fcs"], states)

    from medplib_tpu.models import sam_med2d
    sam_emb = sam_med2d.encode_image(params["sam"]["image_encoder"],
                                     batch.images_sam, cfg2.sam)
    want, _ = medplib.decode_seg_masks(params, cfg2, sam_emb, seg_emb,
                                       cfg2.sam.image_size)
    np.testing.assert_allclose(np.asarray(res.pred_masks),
                               np.asarray(want), atol=2e-3)


@pytest.mark.slow
def test_multi_seg_prompt_and_generated_ordering():
    """Prompt SEGs fill slots before generated ones; max_segs caps capture."""
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    batch = ge._make_batch(cfg, B=1, T=14, rng=np.random.default_rng(5))
    ids = np.array(batch.input_ids)
    ids[ids == cfg.seg_token_idx] = 7
    ids[0, 5] = cfg.seg_token_idx
    ids[0, 8] = cfg.seg_token_idx  # two prompt SEGs
    batch = batch._replace(input_ids=jnp.asarray(ids))
    res = medplib.generate(params, cfg, batch, max_new_tokens=4, eos_id=-1,
                           max_segs=3)
    sv = np.asarray(res.seg_valid)[0]
    assert sv[0] and sv[1]
    assert bool(np.asarray(res.has_seg)[0])
    m = np.asarray(res.pred_masks)[0]
    assert not np.allclose(m[0], m[1])
    # capped capture: max_segs=1 keeps only the first
    res1 = medplib.generate(params, cfg, batch, max_new_tokens=4, eos_id=-1,
                            max_segs=1)
    np.testing.assert_allclose(np.asarray(res1.pred_masks)[0, 0], m[0],
                               atol=2e-3)


def test_top_p_zero_keeps_top1():
    """A client-supplied top_p=0.0 must degrade to top-1 sampling, not an
    all--inf distribution that degenerates to token id 0."""
    from medplib_tpu.ops.sampling import sample_token

    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]] * 3)
    toks = sample_token(jax.random.PRNGKey(0), logits, temperature=0.7,
                        top_p=0.0)
    assert [int(t) for t in toks] == [1, 1, 1]
