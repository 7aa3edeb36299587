"""Regression tests for review findings: generated-<SEG> hidden-state capture
alignment, int8 MoE expert dequantization, bounded region augmentation."""

import dataclasses
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from medplib_tpu.config import MedplibConfig, MoeConfig
from medplib_tpu.models import llama, medplib


@pytest.mark.slow
def test_generated_seg_capture_matches_full_forward():
    """The mask decoded for a generated <SEG> must come from the hidden state
    of the step that PREDICTED the SEG token (reference shifted-mask
    semantics, MedPLIB.py:615-625) — checked against a full-sequence
    forward replay."""
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    batch = ge._make_batch(cfg, B=1, T=12, rng=rng)
    # no planted SEG in the prompt: replace it with an ordinary token
    ids = np.array(batch.input_ids)
    ids[ids == cfg.seg_token_idx] = 7
    batch = batch._replace(input_ids=jnp.asarray(ids))

    res = medplib.generate(params, cfg, batch, max_new_tokens=4, eos_id=-1)
    out = np.asarray(res.output_ids)[0]
    # re-run with seg_token_idx = the 2nd generated token -> that emission
    # becomes a <SEG>; it must not appear in the prompt or earlier output
    seg_tok = int(out[1])
    assert seg_tok not in ids and seg_tok != int(out[0])
    cfg2 = dataclasses.replace(cfg, seg_token_idx=seg_tok)
    res2 = medplib.generate(params, cfg2, batch, max_new_tokens=4, eos_id=-1)
    assert bool(np.asarray(res2.has_seg)[0])
    np.testing.assert_array_equal(np.asarray(res2.output_ids), out[None])

    # replay: full forward over [spliced prompt; generated tokens 0..0] —
    # the state at the last position predicted out[1] (the SEG)
    embeds, _, attn_mask, _, _ = medplib.splice_batch(params, cfg2, batch,
                                                      need_region=False)
    gen_emb = llama.embed(params["llm"], jnp.asarray(out[:1])[None])
    full = jnp.concatenate([embeds, gen_emb], axis=1)
    mask = jnp.concatenate(
        [attn_mask, jnp.ones((1, 1), attn_mask.dtype)], axis=1)
    hidden, _, _ = medplib._llm_forward(params, cfg2, full, mask, train=False)
    last = jnp.sum(attn_mask, -1)  # prompt real length; gen tok appended at end
    # position of the appended generated token = full length - 1
    pred_state = hidden[:, -1:]
    seg_emb = medplib.text_hidden_fcs(params["text_hidden_fcs"], pred_state)

    from medplib_tpu.models import sam_med2d
    sam_emb = sam_med2d.encode_image(params["sam"]["image_encoder"],
                                     batch.images_sam, cfg2.sam)
    want, _ = medplib.decode_seg_masks(params, cfg2, sam_emb, seg_emb,
                                       cfg2.sam.image_size)
    np.testing.assert_allclose(np.asarray(res2.pred_masks[:, 0]),
                               np.asarray(want[:, 0]), atol=2e-3)


def test_first_generated_token_seg_captured():
    """A SEG emitted as the FIRST generated token uses the prefill's last
    hidden state (not the fallback)."""
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    batch = ge._make_batch(cfg, B=1, T=12, rng=rng)
    ids = np.array(batch.input_ids)
    ids[ids == cfg.seg_token_idx] = 7
    batch = batch._replace(input_ids=jnp.asarray(ids))
    res = medplib.generate(params, cfg, batch, max_new_tokens=3, eos_id=-1)
    first = int(np.asarray(res.output_ids)[0, 0])
    cfg2 = dataclasses.replace(cfg, seg_token_idx=first)
    res2 = medplib.generate(params, cfg2, batch, max_new_tokens=3, eos_id=-1)
    assert bool(np.asarray(res2.has_seg)[0])


def test_int8_moe_experts_dequantized():
    """quantize_tree on a MoE model must keep logits close to full precision
    (expert kernels carry scales through ops/moe.moe_mlp)."""
    from medplib_tpu.utils import quantize as qz
    cfg = dataclasses.replace(
        MedplibConfig.tiny(),
        moe=MoeConfig(enable=True, num_experts=2, top_k=1,
                      capacity_factor=4.0, eval_capacity_factor=4.0,
                      moe_mode="dense"))
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    batch = ge._make_batch(cfg, B=2, T=12, rng=np.random.default_rng(0))
    base = medplib.model_forward(params, cfg, batch, train=False)
    qparams = qz.quantize_tree(params)
    # experts actually got quantized
    assert qparams["llm"]["layers"]["moe"]["experts"]["gate_proj"][
        "kernel"].dtype == jnp.int8
    quant = medplib.model_forward(qparams, cfg, batch, train=False)
    ratio = float(quant["ce_loss"]) / max(float(base["ce_loss"]), 1e-6)
    assert 0.8 < ratio < 1.25, (float(base["ce_loss"]),
                                float(quant["ce_loss"]))


def test_sub_component_augment_terminates_at_min_thresh():
    from medplib_tpu.data.preprocess import sub_component_augment
    mask = np.zeros((24, 24), np.uint8)
    mask[0, :10] = 1  # largest component area == min_thresh exactly
    out, ok = sub_component_augment(mask, rng=random.Random(0))
    assert ok and out.sum() > 0


def test_pack_inference_preserves_outputs():
    """Packed qkv/gateup kernels produce identical generate outputs."""
    from medplib_tpu.models import llama
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    batch = ge._make_batch(cfg, B=2, T=12, rng=np.random.default_rng(0))
    base = medplib.generate(params, cfg, batch, max_new_tokens=4)
    packed = dict(params)
    packed["llm"] = llama.pack_inference(params["llm"])
    assert "qkv_proj" in packed["llm"]["layers"]["attn"]
    assert "gateup_proj" in packed["llm"]["layers"]["mlp"]
    got = medplib.generate(packed, cfg, batch, max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(base.output_ids),
                                  np.asarray(got.output_ids))
    np.testing.assert_allclose(np.asarray(base.pred_masks),
                               np.asarray(got.pred_masks), atol=2e-3)

    # quantize composes with packing (out_axis via TRANSPOSED_KERNELS)
    from medplib_tpu.utils import quantize as qz
    qp = qz.quantize_tree(packed)
    assert qp["llm"]["layers"]["attn"]["qkv_proj"]["kernel"].dtype == jnp.int8
    res = medplib.generate(qp, cfg, batch, max_new_tokens=4)
    assert bool(jnp.all(jnp.isfinite(res.pred_masks)))


def test_streaming_decode_matches_generate():
    """stream_prefill + chunked stream_decode_chunk + stream_ground must
    reproduce generate() exactly (tokens and mask)."""
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    batch = ge._make_batch(cfg, B=2, T=12, rng=np.random.default_rng(1))
    max_new = 6
    base = medplib.generate(params, cfg, batch, max_new_tokens=max_new,
                            eos_id=-1)

    state = medplib.stream_prefill(params, cfg, batch,
                                   max_new_tokens=max_new)
    toks = []
    for _ in range(max_new // 2):
        state, chunk_toks, _ = medplib.stream_decode_chunk(
            params, cfg, state, chunk=2, eos_id=-1)
        toks.append(np.asarray(chunk_toks))
    streamed = np.concatenate(toks, axis=1)
    np.testing.assert_array_equal(streamed, np.asarray(base.output_ids))

    masks, seg_valid = medplib.stream_ground(params, cfg, batch, state)
    np.testing.assert_array_equal(np.asarray(seg_valid[:, 0]),
                                  np.asarray(base.has_seg))
    np.testing.assert_allclose(np.asarray(masks),
                               np.asarray(base.pred_masks), atol=2e-3)


def test_region_augmentation_trains_and_is_deterministic(tmp_path):
    """Regression: the per-(sample, region) augmentation rng was seeded with
    a TUPLE, which random.Random rejects on Python 3.11+ — every real
    region-VQA training sample crashed. Also pins determinism: repeated
    loads of the same index produce identical augmented grids (the
    threaded-loader / resume-replay contract)."""
    import json as jsonlib

    import numpy as np
    from PIL import Image

    from medplib_tpu.data.dataset import DataConfig, LazySupervisedDataset

    rng = np.random.default_rng(0)
    Image.fromarray(rng.uniform(0, 255, (50, 70, 3)).astype(np.uint8)
                    ).save(tmp_path / "img.png")
    m = np.zeros((50, 70), np.uint8)
    m[5:20, 10:30] = 255
    m[30:45, 40:60] = 255  # two components: augmentation has work to do
    Image.fromarray(m).save(tmp_path / "r.png")
    records = [{
        "image": str(tmp_path / "img.png"),
        "answer_type": "open",
        "conversations": [
            {"from": "human",
             "value": "<image>\nwhat is <region>r.png</region> ?"},
            {"from": "gpt", "value": "a lesion"}],
    }]
    jsonlib.dump(records, open(tmp_path / "train.json", "w"))

    class Tok:
        bos_token_id = 1
        pad_token_id = 0
        eos_token_id = 2
        model_max_length = 64

        def __call__(self, text, add_special_tokens=True):
            ids = ([1] if add_special_tokens else []) + [
                3 + hash(w) % 200 for w in text.split()]

            class R:
                pass

            r = R()
            r.input_ids = ids
            return r

    cfg = DataConfig(data_path=str(tmp_path / "train.json"),
                     image_folder=str(tmp_path), sam_image_size=64,
                     clip_image_size=56)
    assert cfg.augment_regions  # the default training path
    ds = LazySupervisedDataset(cfg, Tok(), train=True)
    s1 = ds[0]
    s2 = ds[0]
    assert s1["region_masks"], "region mask extracted"
    np.testing.assert_array_equal(np.asarray(s1["region_masks"][0]),
                                  np.asarray(s2["region_masks"][0]))
