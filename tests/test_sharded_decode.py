"""Sharded (multi-chip) INFERENCE equivalence on the 8-virtual-CPU mesh.

VERDICT r3 #1: generate()/KV-cache decode had only ever run single-device;
the EP dispatch + TP shardings were exercised for training alone. These
tests jit the full generation path — prefill, KV-cache decode scan, SEG
capture, SAM grounding — over a (data=2, expert=2, model=2) mesh with
ep_shard=True and assert token/mask equality against the identical program
on one device. Reference scope: deepspeed `MoE(ep_size=...)` serving
partitioning, /root/reference/model/medplib/model/language_model/
medplib_moe_llama.py:602-614.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from medplib_tpu.config import MedplibConfig, MeshConfig, MoeConfig
from medplib_tpu.models import medplib
from medplib_tpu.parallel.mesh import (AXIS_DATA, AXIS_EXPERT, make_mesh,
                                       param_sharding)

pytestmark = pytest.mark.slow  # 8-device compile-heavy equivalence tier


def _setup(B=8, T=16):
    mesh_cfg = MeshConfig(data=2, expert=2, model=2)
    mesh = make_mesh(mesh_cfg)
    cfg = MedplibConfig.tiny()
    cfg = dataclasses.replace(
        cfg, moe=MoeConfig(enable=True, num_experts=2, top_k=1,
                           capacity_factor=4.0, eval_capacity_factor=4.0,
                           moe_mode="dense"))
    params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(jax.device_put, params,
                                    param_sharding(mesh, params))

    import __graft_entry__ as graft
    batch = graft._make_batch(cfg, B=B, T=T, rng=np.random.default_rng(0))
    bsh = jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, P((AXIS_DATA, AXIS_EXPERT)) if x.ndim >= 1 else P()),
        batch)
    batch = jax.tree_util.tree_map(jax.device_put, batch, bsh)
    return mesh, cfg, params, batch


def _to_one_device(tree):
    dev0 = jax.devices()[0]
    return jax.device_put(jax.tree_util.tree_map(np.asarray, tree), dev0)


def test_sharded_generate_matches_single_device():
    mesh, cfg, params, batch = _setup()

    def gen(p, b, ep):
        return medplib.generate(p, cfg, b, max_new_tokens=5, ep_shard=ep,
                                max_segs=2)

    with jax.set_mesh(mesh):
        res_m = jax.jit(lambda p, b: gen(p, b, True))(params, batch)
        jax.block_until_ready(res_m)
    res_1 = jax.jit(lambda p, b: gen(p, b, False))(
        _to_one_device(params), _to_one_device(batch))

    np.testing.assert_array_equal(np.asarray(res_m.output_ids),
                                  np.asarray(res_1.output_ids))
    np.testing.assert_array_equal(np.asarray(res_m.seg_valid),
                                  np.asarray(res_1.seg_valid))
    np.testing.assert_allclose(np.asarray(res_m.pred_masks, np.float32),
                               np.asarray(res_1.pred_masks, np.float32),
                               atol=2e-3, rtol=1e-3)


def test_sharded_stream_matches_sharded_generate():
    """The serving path (stream_prefill -> chunked decode -> grounding)
    under the mesh must produce the same tokens + masks as one-shot
    sharded generate()."""
    mesh, cfg, params, batch = _setup()
    max_new = 4

    def gen(p, b):
        return medplib.generate(p, cfg, b, max_new_tokens=max_new,
                                ep_shard=True, max_segs=2)

    def stream(p, b):
        st = medplib.stream_prefill(p, cfg, b, max_new_tokens=max_new,
                                    max_segs=2, ep_shard=True)
        st, t1, d1 = medplib.stream_decode_chunk(p, cfg, st, 2,
                                                 ep_shard=True)
        st, t2, d2 = medplib.stream_decode_chunk(p, cfg, st, 2,
                                                 ep_shard=True)
        masks, valid = medplib.stream_ground(p, cfg, b, st)
        return (jnp.concatenate([t1, t2], 1),
                jnp.concatenate([d1, d2], 1), masks, valid)

    with jax.set_mesh(mesh):
        res = jax.jit(gen)(params, batch)
        toks, dones, masks, valid = jax.jit(stream)(params, batch)
        jax.block_until_ready((res, toks, masks))

    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(res.output_ids))
    np.testing.assert_array_equal(np.asarray(valid),
                                  np.asarray(res.seg_valid))
    np.testing.assert_allclose(np.asarray(masks, np.float32),
                               np.asarray(res.pred_masks, np.float32),
                               atol=2e-3, rtol=1e-3)
