"""GeoRegionSampler parity vs the reference torch module (deterministic
configuration: nnz(mask) == num_init_point, FPS start index 0)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from medplib_tpu.models import geo_sampler as gs

torch = pytest.importorskip("torch")

from reference_oracle import load_ref_module  # noqa: E402


def test_fps_matches_reference():
    ref = load_ref_module("rp_sampler.GeoSampler")
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(1, 40, 2)).astype(np.float32)
    # pin the random start to 0 on the torch side
    orig = torch.randint
    torch.randint = lambda *a, **k: torch.zeros(a[2], dtype=torch.long)
    try:
        want = ref.farthest_point_sample(torch.tensor(pts), 8)[0].numpy()
    finally:
        torch.randint = orig
    got = np.asarray(gs.farthest_point_sample(jnp.asarray(pts[0]), 8,
                                              start_idx=0))
    np.testing.assert_array_equal(got, want)


def test_knn_matches_reference():
    ref = load_ref_module("rp_sampler.GeoSampler")
    rng = np.random.default_rng(1)
    pts = rng.uniform(size=(1, 30, 2)).astype(np.float32)
    q = rng.uniform(size=(1, 5, 2)).astype(np.float32)
    want = ref.knn_point(4, torch.tensor(pts), torch.tensor(q))[0].numpy()
    got = np.asarray(gs.knn(jnp.asarray(pts[0]), jnp.asarray(q[0]), 4))
    # topk order may differ; compare as sets per query
    for i in range(5):
        assert set(got[i].tolist()) == set(want[i].tolist())


def test_full_sampler_parity():
    """Tie-free configuration: num_neighbor == pool size at each stage so
    the kNN set is the full point set — torch topk and jax top_k break exact
    grid-distance ties differently (torch CPU prefers higher indices), which
    is semantically irrelevant but breaks bit-parity at k-boundaries."""
    ref = load_ref_module("rp_sampler.GeoSampler")
    torch.manual_seed(0)
    d_in, d_out = 16, 24
    P, SUB, NB = 24, (8, 4), (24, 8)
    tmod = ref.GeoRegionSampler(
        input_dim=d_in, output_dim=d_out, num_init_point=P,
        num_sub_point=list(SUB), num_neighbor=list(NB),
        pooler_mode="max").eval()

    # jax params from torch weights
    params = {"stages": [], "flatten_projector": None, "dim_projector": None}
    for i in range(len(SUB)):
        diff = tmod.diff_projector_list[i]
        agg = tmod.agg_projector_list[i]
        params["stages"].append({
            "diff": {"kernel": jnp.asarray(diff.weight.detach().numpy().T),
                     "bias": jnp.asarray(diff.bias.detach().numpy())},
            "agg": {
                "kernel": jnp.asarray(
                    agg.net[0].weight.detach().numpy()[:, :, 0].T),
                "bias": jnp.asarray(agg.net[0].bias.detach().numpy()),
                "norm": {"weight": jnp.asarray(
                    agg.norm.weight.detach().numpy()),
                    "bias": jnp.asarray(agg.norm.bias.detach().numpy())},
            }})
    params["flatten_projector"] = {
        "kernel": jnp.asarray(tmod.flatten_projector.weight.detach().numpy().T),
        "bias": jnp.asarray(tmod.flatten_projector.bias.detach().numpy())}
    params["dim_projector"] = {
        "kernel": jnp.asarray(tmod.dim_projector.weight.detach().numpy().T),
        "bias": jnp.asarray(tmod.dim_projector.bias.detach().numpy())}

    g = 8
    rng = np.random.default_rng(2)
    fmap = rng.normal(size=(g * g, d_in)).astype(np.float32)
    # mask with exactly P nonzero cells -> sampling is the full set in
    # row-major order on both sides
    mask = np.zeros((g, g), np.float32)
    flatpos = rng.choice(g * g, size=P, replace=False)
    mask.flat[np.sort(flatpos)] = 1

    orig = torch.randint
    torch.randint = lambda *a, **k: torch.zeros(a[2], dtype=torch.long)
    try:
        with torch.no_grad():
            want = tmod([torch.tensor(fmap)], [[torch.tensor(mask)]],
                        original_dtype=torch.float32,
                        return_dtype=torch.float32)[0][0].numpy()
    finally:
        torch.randint = orig

    got = gs.apply_geo_sampler(
        params, jnp.asarray(fmap)[None], jnp.asarray(mask)[None, None],
        jnp.ones((1, 1), bool), num_init_point=P, num_sub_point=SUB,
        num_neighbor=NB, pooler_mode="max")
    np.testing.assert_allclose(np.asarray(got)[0, 0], want, rtol=2e-3,
                               atol=2e-4)
