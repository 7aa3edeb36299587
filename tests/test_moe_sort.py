"""Sort-based MoE dispatch must match the einsum (one-hot) dispatch exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from medplib_tpu.config import MoeConfig
from medplib_tpu.ops import moe as moe_ops


def _params(rng, e, h, m):
    return {
        "router": {"kernel": jnp.asarray(
            rng.normal(size=(h, e)).astype(np.float32))},
        "experts": {
            "gate_proj": {"kernel": jnp.asarray(
                rng.normal(size=(e, h, m)).astype(np.float32) * 0.1)},
            "up_proj": {"kernel": jnp.asarray(
                rng.normal(size=(e, h, m)).astype(np.float32) * 0.1)},
            "down_proj": {"kernel": jnp.asarray(
                rng.normal(size=(e, m, h)).astype(np.float32) * 0.1)},
        },
    }


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("cf", [4.0, 0.6])
def test_sort_matches_einsum(top_k, cf):
    rng = np.random.default_rng(0)
    e, h, m = 4, 16, 32
    params = _params(rng, e, h, m)
    x = jnp.asarray(rng.normal(size=(2, 11, h)).astype(np.float32))
    cfg = MoeConfig(enable=True, num_experts=e, top_k=top_k,
                    capacity_factor=cf, min_capacity=0)
    y_sort, aux_sort = moe_ops.moe_mlp(params, x, cfg, dispatch_mode="sort")
    y_ein, aux_ein = moe_ops.moe_mlp(params, x, cfg, dispatch_mode="einsum")
    np.testing.assert_allclose(np.asarray(y_sort), np.asarray(y_ein),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux_sort), float(aux_ein), rtol=1e-6)


def test_sort_dispatch_slots_respect_capacity():
    rng = np.random.default_rng(1)
    s, e, cap = 12, 2, 3
    # force everything to expert 0
    logits = jnp.asarray(
        np.stack([np.ones(s), -np.ones(s)], -1).astype(np.float32))
    d = moe_ops.sort_dispatch(logits, 1, cap)
    kept = np.asarray(d.token_slot) < e * cap
    assert kept.sum() == cap  # only `cap` tokens survive
    assert kept[:cap].all()   # the FIRST tokens in order (cumsum semantics)
    assert (np.asarray(d.token_prob)[~kept] == 0).all()
