"""Normalization ops.

Computed in float32 regardless of activation dtype (matches HF LLaMA
numerics), cast back to the input dtype at the end. XLA fuses these into
neighbouring ops; no Pallas needed — they are bandwidth-bound and fuse away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LLaMA RMSNorm: x * rsqrt(mean(x^2) + eps) * weight."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * (var + eps) ** -0.5
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def layer_norm_2d(x, weight, bias, eps: float = 1e-6):
    """Channels-last LayerNorm2d over the channel axis for NHWC feature maps
    (SAM's LayerNorm2d, reference modeling/common.py)."""
    return layer_norm(x, weight, bias, eps)
