"""StableHLO deployment export of the SEG->mask decode head (counterpart of
the reference's SAM ONNX export)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import MedplibConfig
from medplib_tpu.models import medplib
from medplib_tpu.utils.export import export_seg_decoder


@pytest.mark.slow
def test_export_roundtrip_matches_direct_call():
    cfg = MedplibConfig.tiny()
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    blob = export_seg_decoder(params, cfg, batch_size=2, num_segs=1,
                              platforms=("cpu",))
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

    from jax import export as jexport
    fn = jexport.deserialize(blob)

    e = cfg.sam.image_embedding_size
    d = cfg.sam.prompt_embed_dim
    sam_emb = jax.random.normal(jax.random.PRNGKey(1), (2, e, e, d))
    hidden = jax.random.normal(jax.random.PRNGKey(2),
                               (2, 1, cfg.llm.hidden_size))
    sub = {k: params[k] for k in ("sam", "text_hidden_fcs")}
    masks, iou = fn.call(sub["sam"], sub["text_hidden_fcs"], sam_emb, hidden)

    seg = medplib.text_hidden_fcs(params["text_hidden_fcs"], hidden)
    ref_masks, ref_iou = medplib.decode_seg_masks(params, cfg, sam_emb, seg,
                                                  cfg.sam.image_size)
    np.testing.assert_allclose(np.asarray(masks), np.asarray(ref_masks),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(iou), np.asarray(ref_iou),
                               atol=1e-5)


def test_delta_roundtrip_and_consolidate(tmp_path):
    from medplib_tpu.utils.export import apply_delta, consolidate, make_delta
    base = {"a": {"kernel": np.ones((4, 4), np.float32)},
            "b": {"kernel": np.full((2, 2), 3.0, np.float32)}}
    target = {"a": {"kernel": np.full((4, 4), 2.5, np.float32)},
              "b": {"kernel": np.full((2, 2), 3.0, np.float32)},
              "mm_projector": {"kernel": np.eye(2, dtype=np.float32)}}
    delta = make_delta(base, target)
    np.testing.assert_allclose(delta["a"]["kernel"], 1.5)
    np.testing.assert_allclose(delta["mm_projector"]["kernel"], np.eye(2))
    back = apply_delta(base, delta)
    np.testing.assert_allclose(back["a"]["kernel"],
                               target["a"]["kernel"])
    np.testing.assert_allclose(back["mm_projector"]["kernel"], np.eye(2))

    from medplib_tpu.utils.checkpoint import load_params, save_params
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    save_params(src, base)
    consolidate(src, dst)
    out = load_params(dst)
    np.testing.assert_allclose(np.asarray(out["a"]["kernel"]),
                               base["a"]["kernel"])
