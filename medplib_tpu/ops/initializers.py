"""Parameter initializers. Kept minimal: trained checkpoints are loaded via
the weight-translation layer; init only matters for new heads / tests."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32,
               scale: float | None = None):
    """Kernel [in_dim, out_dim], truncated-normal fan-in scaling."""
    if scale is None:
        scale = in_dim ** -0.5
    return (jax.random.truncated_normal(key, -2.0, 2.0, (in_dim, out_dim),
                                        jnp.float32) * scale).astype(dtype)


def embed_init(key, vocab: int, dim: int, dtype=jnp.float32, scale=0.02):
    return (jax.random.normal(key, (vocab, dim), jnp.float32) * scale).astype(dtype)


def zeros_init(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones_init(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
