"""Rotary position embeddings (LLaMA-style, half-rotation layout).

Matches HF `apply_rotary_pos_emb` numerics: frequencies over even dims,
rotate_half = [-x2, x1] with x split in contiguous halves.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_freqs(head_dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """[head_dim/2] inverse frequencies."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponents)


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float = 10000.0):
    """positions [..., T] -> cos/sin [..., T, head_dim] (HF duplicated layout)."""
    inv = rope_freqs(head_dim, theta)  # [D/2]
    angles = positions[..., None].astype(jnp.float32) * inv  # [..., T, D/2]
    angles = jnp.concatenate([angles, angles], axis=-1)      # [..., T, D]
    return jnp.cos(angles), jnp.sin(angles)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, H, D]; cos/sin: [B, T, D] or [T, D]."""
    if cos.ndim == x.ndim - 1:
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)
