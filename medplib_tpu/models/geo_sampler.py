"""GeoRegionSampler: Ferret-style geometric region feature pooling.

Rebuild of /root/reference/model/rp_sampler/GeoSampler.py:162-345 — sample
points from each region mask, bilinear-sample their CLIP features, then two
stages of (farthest-point subsample -> kNN grouping -> diff/agg projections
-> pooling), finishing with flatten + dim projectors.

TPU-first: everything is static-shape and batched over all masks at once —
point sampling is a top-k over randomized priorities (with wrap-around
repeats, matching `rand_sample_repeat` padding), FPS is a `fori_loop` over a
distance carry, kNN a dense pairwise-distance top-k. The reference loops per
image / per mask in Python.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from medplib_tpu.ops.initializers import dense_init
from medplib_tpu.ops.norms import layer_norm

Params = Dict[str, Any]


def init_geo_sampler(key, input_dim: int, output_dim: int,
                     num_sub_point: Sequence[int] = (128, 32),
                     dtype=jnp.float32) -> Params:
    d = input_dim
    stages = []
    keys = jax.random.split(key, 2 * len(num_sub_point) + 2)
    for i in range(len(num_sub_point)):
        stages.append({
            "diff": {"kernel": dense_init(keys[2 * i], d + 2, d + 2, dtype),
                     "bias": jnp.zeros((d + 2,), dtype)},
            "agg": {
                "kernel": dense_init(keys[2 * i + 1], 2 * (d + 2), d, dtype),
                "bias": jnp.zeros((d,), dtype),
                "norm": {"weight": jnp.ones((d,), dtype),
                         "bias": jnp.zeros((d,), dtype)},
            },
        })
    return {
        "stages": stages,
        "flatten_projector": {
            "kernel": dense_init(keys[-2], d * num_sub_point[-1], d, dtype),
            "bias": jnp.zeros((d,), dtype)},
        "dim_projector": {
            "kernel": dense_init(keys[-1], d, output_dim, dtype),
            "bias": jnp.zeros((output_dim,), dtype)},
    }


def sample_mask_points(mask: jnp.ndarray, num_points: int,
                       key: Optional[jax.Array] = None) -> jnp.ndarray:
    """[H, W] binary -> [P, 2] normalized (y/H, x/W) coords of nonzero cells;
    wraps around (repeats) when the mask has fewer than P nonzero cells
    (rand_sample_repeat semantics). Deterministic row-major order when no key
    is given."""
    h, w = mask.shape
    flat = mask.reshape(-1) > 0
    n = jnp.sum(flat.astype(jnp.int32))
    idx_rank = jnp.arange(h * w, dtype=jnp.float32)
    if key is None:
        pri = jnp.where(flat, -idx_rank, -jnp.inf)
    else:
        pri = jnp.where(flat, jax.random.uniform(key, (h * w,)), -jnp.inf)
    _, order = jax.lax.top_k(pri, min(num_points, h * w))
    take = jnp.arange(num_points) % jnp.maximum(n, 1)
    take = jnp.clip(take, 0, order.shape[0] - 1)
    sel = order[take]
    ys = (sel // w).astype(jnp.float32) / h
    xs = (sel % w).astype(jnp.float32) / w
    return jnp.stack([ys, xs], axis=-1)


def bilinear_point_features(feature_map: jnp.ndarray,
                            coords_yx: jnp.ndarray) -> jnp.ndarray:
    """feature_map [H, W, C], coords (y, x) in [0,1] -> [P, C]; matches
    grid_sample(align_corners=True) on 2*c-1 grids (GeoSampler.py:30-55)."""
    h, w, c = feature_map.shape
    fy = coords_yx[:, 0] * (h - 1)
    fx = coords_yx[:, 1] * (w - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    dy = (fy - y0)[:, None]
    dx = (fx - x0)[:, None]
    f = feature_map
    out = (f[y0, x0] * (1 - dy) * (1 - dx) + f[y0, x1] * (1 - dy) * dx +
           f[y1, x0] * dy * (1 - dx) + f[y1, x1] * dy * dx)
    return out


def farthest_point_sample(points: jnp.ndarray, npoint: int,
                          start_idx: int = 0) -> jnp.ndarray:
    """points [N, 2] -> [npoint] indices (GeoSampler.py:57-77; the reference
    starts from a random index — pass start_idx to control)."""
    n = points.shape[0]

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[i].set(farthest)
        centroid = points[farthest]
        dist = jnp.sum((points - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, dist)
        return centroids, distance, jnp.argmax(distance)

    init = (jnp.zeros((npoint,), jnp.int32),
            jnp.full((n,), 1e10, jnp.float32),
            jnp.asarray(start_idx, jnp.int32))
    centroids, _, _ = jax.lax.fori_loop(0, npoint, body, init)
    return centroids


def knn(points: jnp.ndarray, queries: jnp.ndarray, k: int) -> jnp.ndarray:
    """[N,2], [S,2] -> [S, k] nearest-neighbor indices.

    Distance accumulation matches the reference's square_distance order
    ((-2qp + q²) + p², GeoSampler.py:101-120) bit for bit — grid points
    produce massive distance ties and the k-th-neighbor tie-break depends on
    the exact float values."""
    d = -2.0 * (queries @ points.T)
    d = d + jnp.sum(queries ** 2, -1)[:, None]
    d = d + jnp.sum(points ** 2, -1)[None]
    _, idx = jax.lax.top_k(-d, k)
    return idx


def apply_geo_sampler(params: Params, feature_map: jnp.ndarray,
                      region_masks: jnp.ndarray, valid: jnp.ndarray,
                      num_init_point: int = 512,
                      num_sub_point: Sequence[int] = (128, 32),
                      num_neighbor: Sequence[int] = (24, 24),
                      pooler_mode: str = "max",
                      key: Optional[jax.Array] = None) -> jnp.ndarray:
    """feature_map [B, H*W, C] (RAW clip features — geo path pools before any
    adapter, medplib_arch.py:205-207); region_masks [B, M, Hm, Wm];
    valid [B, M] -> [B, M, out_dim]."""
    b, m = region_masks.shape[:2]
    hw, c = feature_map.shape[1:]
    g = int(math.isqrt(hw))
    fmap = feature_map.reshape(b, g, g, c)

    def one_mask(fm, mask, k1):
        pts = sample_mask_points(mask, num_init_point,
                                 key=k1 if key is not None else None)
        fea = bilinear_point_features(fm, pts)
        for si, (nsub, nnb) in enumerate(zip(num_sub_point, num_neighbor)):
            sp = params["stages"][si]
            fps_idx = farthest_point_sample(pts, nsub)
            new_pts = pts[fps_idx]
            new_fea = fea[fps_idx]
            nb = knn(pts, new_pts, nnb)                      # [nsub, k]
            grouped_pts = pts[nb]                            # [nsub, k, 2]
            grouped_fea = fea[nb]                            # [nsub, k, d]
            local = jnp.concatenate([grouped_fea, grouped_pts], -1)
            anchor = jnp.concatenate([new_fea, new_pts], -1)[:, None]
            diff = local - anchor
            diff = diff @ sp["diff"]["kernel"] + sp["diff"]["bias"]
            gathered = jnp.concatenate(
                [diff, jnp.broadcast_to(anchor, diff.shape)], -1)
            # ConvReLULN1D: 1x1 conv (linear) + ReLU + LayerNorm over channel
            gathered = jax.nn.relu(
                gathered @ sp["agg"]["kernel"] + sp["agg"]["bias"])
            gathered = layer_norm(gathered, sp["agg"]["norm"]["weight"],
                                  sp["agg"]["norm"]["bias"])
            if pooler_mode == "max":
                fea = jnp.max(gathered, axis=1)
            else:
                fea = jnp.mean(gathered, axis=1)
            pts = new_pts
        x = fea.reshape(-1)
        x = x @ params["flatten_projector"]["kernel"] + \
            params["flatten_projector"]["bias"]
        return x @ params["dim_projector"]["kernel"] + \
            params["dim_projector"]["bias"]

    keys = (jax.random.split(key, b * m).reshape(b, m, -1)
            if key is not None else jnp.zeros((b, m, 2), jnp.uint32))
    out = jax.vmap(lambda fm, masks, ks: jax.vmap(
        lambda mk, k1: one_mask(fm, mk, k1))(masks, ks))(
        fmap, region_masks, keys)
    return out * valid[..., None].astype(out.dtype)
