"""Weight-only int8 quantization for inference.

TPU-native counterpart of the reference's bitsandbytes 4/8-bit loading
(/root/reference/chat.py:89-112, builder.py:39-48, including the
skip-visual-modules behavior of `llm_int8_skip_modules=["visual_model"]`):
per-output-channel symmetric int8 with an f32 scale, dequantized inside the
matmul fusion. Halves HBM for the 7B weights — decode is memory-bound, so
this directly buys decode throughput and frees room for batch/KV cache.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from medplib_tpu.train.lora import TRANSPOSED_KERNELS

# modules never quantized (normalization-sensitive or tiny)
SKIP_MODULES = ("sam", "clip", "text_hidden_fcs", "region_fea_adapter",
                "mask_encoder", "mm_token_compressor", "router",
                "embed_tokens", "norm", "input_layernorm",
                "post_attention_layernorm")


import functools


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def _quantize_kernel(kernel: jnp.ndarray, out_axis: int):
    """Donated input: the bf16 kernel's HBM is reclaimed as the int8 output
    is produced — quantizing a 7B tree never holds both precisions."""
    absmax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=tuple(
        a for a in range(kernel.ndim) if a != out_axis and
        a >= kernel.ndim - 2), keepdims=True)
    # leading stacked dims (layer/expert) keep their own scales
    scale = absmax / 127.0
    q = jnp.clip(jnp.round(kernel.astype(jnp.float32) /
                           jnp.maximum(scale, 1e-12)), -127, 127
                 ).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_tree(params: Any, skip: Sequence[str] = SKIP_MODULES) -> Any:
    """Replace eligible linear kernels with {"kernel": int8,
    "scale": f32} pairs. LoRA adapters and biases stay full precision."""

    def rec(node, path):
        if isinstance(node, dict):
            if "kernel" in node and not any(s in path for s in skip):
                k = node["kernel"]
                if hasattr(k, "ndim") and k.ndim >= 2 and k.size >= 1 << 12:
                    name = path[-1] if path else ""
                    out_axis = (k.ndim - 2 if name in TRANSPOSED_KERNELS
                                else k.ndim - 1)
                    # drop the tree's reference BEFORE quantizing so the
                    # donated buffer is actually freeable
                    node["kernel"] = None
                    q, scale = _quantize_kernel(jnp.asarray(k), out_axis)
                    del k
                    node["kernel"] = q
                    node["scale"] = scale
                    for kk, vv in node.items():
                        if kk not in ("kernel", "scale"):
                            node[kk] = rec(vv, path + (kk,))
                    return node
            for k2, v in node.items():
                node[k2] = rec(v, path + (k2,))
            return node
        if isinstance(node, list):
            return [rec(v, path) for v in node]
        return node

    return rec(params, ())


def dequantize_matmul(x: jnp.ndarray, p: Dict, transposed: bool):
    """x @ dequant(kernel). The dequant multiply fuses into the matmul's
    operand read on TPU."""
    w = p["kernel"].astype(x.dtype)
    scale = p["scale"].astype(x.dtype)
    if transposed:  # [.., out, in] kernels, scale [.., out, 1]
        return jnp.einsum("...i,oi->...o", x, w * scale)
    return x @ (w * scale)
