"""LoRA: low-rank adapters injected into linear kernels.

Rebuilds the reference's peft-based LoRA injection
(/root/reference/train_ds_medplib.py:262-303: target modules resolved by
name, visual modules excluded) for stacked-param scan layers: adapters live
NEXT TO the kernel in the param tree ("lora_a"/"lora_b"), and
`ops`-level linears apply `y = x @ W + (x @ A) @ B * (alpha/r)` when
adapters are present — no materialized merged weight during training.

`merge()` folds adapters into the kernels for export, matching the
reference's `merge_and_unload` + HF save flow
(merge_lora_weights_and_save_hf_model_moe.py:322-344).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# LoRA dropout (train_ds_medplib.py:279-285 passes lora_dropout to peft;
# peft applies nn.Dropout to the adapter INPUT during training only:
# y = W x + B A dropout(x) * scale). Activated by the trainer via the
# trace-time context below — inference/eval paths never enter it, so their
# compiled programs contain no dropout ops.
# ---------------------------------------------------------------------------

_LORA_DROPOUT = threading.local()


@contextlib.contextmanager
def lora_dropout_ctx(rng: jnp.ndarray, rate: float):
    """Enable dropout on the LoRA path while TRACING under this context.

    `rng` may be a traced key (e.g. folded from the step counter inside a
    jitted train step). Each lora-linear CALL SITE gets a distinct key via a
    trace-time counter; layers stacked under one `lax.scan` share a call
    site and therefore a mask — a deliberate TPU-first trade (per-layer
    keys would have to ride the scan carry) that keeps the regularizer
    honest in expectation."""
    prev = getattr(_LORA_DROPOUT, "state", None)
    _LORA_DROPOUT.state = {"rng": rng, "rate": float(rate), "n": 0}
    try:
        yield
    finally:
        _LORA_DROPOUT.state = prev


def _lora_input(x: jnp.ndarray) -> jnp.ndarray:
    """Dropout on the adapter input when tracing under lora_dropout_ctx."""
    st = getattr(_LORA_DROPOUT, "state", None)
    if not st or st["rate"] <= 0.0:
        return x
    st["n"] += 1
    key = jax.random.fold_in(st["rng"], st["n"])
    keep = 1.0 - st["rate"]
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0).astype(x.dtype)


def _iter_linear_paths(tree: Params, prefix=()):
    if isinstance(tree, dict):
        if "kernel" in tree:
            yield prefix, tree
        for k, v in tree.items():
            if k != "kernel":
                yield from _iter_linear_paths(v, prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _iter_linear_paths(v, prefix + (str(i),))


def inject(key, params: Params, target_modules: Sequence[str], r: int,
           exclude: Sequence[str] = ("clip", "sam", "mask_encoder",
                                     "mm_token_compressor")) -> Params:
    """Add lora_a/lora_b beside every kernel whose path ends in a target
    module name (and isn't under an excluded subtree). Mutates a copy."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    n = 0
    for path, node in _iter_linear_paths(params):
        if any(e in path for e in exclude):
            continue
        if not path or path[-1] not in target_modules:
            continue
        kern = node["kernel"]
        *lead, din, dout = kern.shape
        transposed = path[-1] in TRANSPOSED_KERNELS
        # QLoRA: kernels may already be quantized — adapters stay float,
        # and int4 nibble-packed kernels store HALF the reduction rows
        if "scale4" in node or "scale4h" in node:
            if transposed:
                dout *= 2   # [out, in/2] packed
            else:
                din *= 2    # [in/2, out] packed
        if transposed:
            din, dout = dout, din
        adtype = (kern.dtype if jnp.issubdtype(kern.dtype, jnp.floating)
                  else jnp.bfloat16)
        key, k1 = jax.random.split(key)
        node["lora_a"] = (jax.random.normal(k1, tuple(lead) + (din, r))
                          * (1.0 / r)).astype(adtype)
        node["lora_b"] = jnp.zeros(tuple(lead) + (r, dout), adtype)
        n += 1
    if n == 0:
        raise ValueError(f"no modules matched {target_modules}")
    return params


def dequant_kernel(p: Params, dtype) -> jnp.ndarray:
    """Weight-only int8/int4 support: single home for the dequant pattern
    (used by linear/linear_t here and ops/moe.moe_mlp); the multiply — and
    for int4 the two nibble-unpack shifts — fuse into the consuming matmul.

    int8 nodes: {kernel int8, scale f32 per-out-channel}.
    int4 nodes: {kernel nibble-packed int8, scale4 f32 blockwise} as
    written by utils/quantize._quantize_kernel4; the position of scale4's
    size-1 axis says whether the kernel is [in, out] or transposed.
    int4 "half" nodes ({kernel, scale4h}) materialize via dequant_int4h —
    but matmul callers (linear/linear_t/moe_mlp) route them through the
    fused grouped dots instead, which is the whole point of the layout."""
    kern = p["kernel"]
    if "scale4h" in p:
        from medplib_tpu.utils.quantize import dequant_int4h
        return dequant_int4h(kern, p["scale4h"], dtype)
    if "scale4" in p:
        s = p["scale4"]
        transposed = s.shape[-1] == 1  # else [.., nb, 1, out]
        axis = kern.ndim - 1 if transposed else kern.ndim - 2
        # arithmetic shifts sign-extend: low nibble via <<4 then >>4
        lo = jnp.right_shift(jnp.left_shift(kern, 4), 4)
        hi = jnp.right_shift(kern, 4)
        w = jnp.stack([lo, hi], axis=axis + 1)
        full = kern.shape[:axis] + (2 * kern.shape[axis],) + \
            kern.shape[axis + 1:]
        # dequant in the TARGET dtype: an f32 intermediate doubles the
        # materialized kernel (the interleave keeps XLA from fusing the
        # unpack into the matmul operand read, unlike the int8 path below)
        w = w.reshape(full).astype(dtype)
        s = s.astype(dtype)
        if transposed:
            nb = s.shape[-2]
            w = (w.reshape(w.shape[:-1] + (nb, w.shape[-1] // nb)) * s
                 ).reshape(full)
        else:
            nb = s.shape[-3]
            w = (w.reshape(w.shape[:-2] + (nb, w.shape[-2] // nb,
                                           w.shape[-1])) * s).reshape(full)
        return w
    if kern.dtype == jnp.int8:
        return kern.astype(dtype) * p["scale"].astype(dtype)
    return kern


def _use_w8a8(p: Params, x: jnp.ndarray) -> bool:
    """W8A8 engages only when (a) tracing under dynamic_act_quant(), (b) the
    node is weight-only-int8 2D (scan-body layer slice or plain kernel), and
    (c) M is prefill-sized — decode stays weight-only (memory-bound; the
    activation quant would cost fidelity for zero speedup)."""
    if "scale" not in p or getattr(p["kernel"], "dtype", None) != jnp.int8 \
            or p["kernel"].ndim != 2 or "lora_a" in p:
        return False
    from medplib_tpu.utils.quantize import act_quant_enabled
    if not act_quant_enabled():
        return False
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    return rows >= 512


def linear(p: Params, x: jnp.ndarray, scale: float = 2.0) -> jnp.ndarray:
    """x @ kernel with optional LoRA path. `scale` = alpha / r.

    Int8 nodes stay on the XLA dequant path even in decode: measured on
    v5e-1 at 7B/B=12, routing the scan-body layer slices into the Pallas
    int8 matmul REGRESSED the headline bench 9.61 -> 9.16 masks/s (the
    dynamic layer slice feeding a custom call forfeits XLA's in-fusion
    dequant), and unroll_layers=True (true 2D kernels) exceeds HBM at 7B
    because the per-layer KV stack can't alias in place. The Pallas kernel
    remains the right tool for the pack_inference wide kernels
    (models/llama.py dense_mlp/_qkv packed branches).

    Under utils/quantize.dynamic_act_quant(), large-M (prefill-regime)
    matmuls on int8 nodes run W8A8: activations quantized per-row at
    runtime and the matmul issued on the 2x-rate int8 MXU path."""
    if _use_w8a8(p, x):
        from medplib_tpu.utils.quantize import int8_dyn_matmul
        y = int8_dyn_matmul(x, p["kernel"], p["scale"], transposed=False)
    elif "scale4h" in p and p["kernel"].ndim == 2:
        from medplib_tpu.utils.quantize import int4h_matmul
        y = int4h_matmul(x, p["kernel"], p["scale4h"])
    else:
        y = x @ dequant_kernel(p, x.dtype)
    if "lora_a" in p:
        xd = _lora_input(x)
        y = y + ((xd @ p["lora_a"]) @ p["lora_b"]) * scale
    if "bias" in p:
        y = y + p["bias"]
    return y


def linear_t(p: Params, x: jnp.ndarray, scale: float = 2.0) -> jnp.ndarray:
    """Linear with a TRANSPOSED kernel [out, in] (attention q/k/v storage,
    see models/llama.py init_layer). LoRA adapters keep their usual
    [in, r]/[r, out] shapes."""
    if _use_w8a8(p, x):
        from medplib_tpu.utils.quantize import int8_dyn_matmul
        y = int8_dyn_matmul(x, p["kernel"], p["scale"], transposed=True)
    elif "scale4h" in p and p["kernel"].ndim == 2:
        from medplib_tpu.utils.quantize import int4h_matmul_t
        y = int4h_matmul_t(x, p["kernel"], p["scale4h"])
    else:
        y = jnp.einsum("...i,oi->...o", x, dequant_kernel(p, x.dtype))
    if "lora_a" in p:
        xd = _lora_input(x)
        y = y + ((xd @ p["lora_a"]) @ p["lora_b"]) * scale
    if "bias" in p:
        y = y + p["bias"]
    return y


# kernels stored [out, in] instead of [in, out]
TRANSPOSED_KERNELS = ("q_proj", "k_proj", "v_proj", "qkv_proj")


def merge(params: Params, scale: float = 2.0) -> Params:
    """Fold LoRA deltas into kernels and drop adapter leaves (export path)."""
    def rec(node, name=""):
        if isinstance(node, dict):
            out = {}
            if "kernel" in node and "lora_a" in node:
                if any(s in node for s in ("scale", "scale4", "scale4h")):
                    raise ValueError(
                        "cannot merge LoRA into a QUANTIZED kernel "
                        f"({name}): dequantize first (QLoRA export path: "
                        "keep adapters separate or merge pre-quantization)")
                delta = jnp.einsum("...ir,...ro->...io", node["lora_a"],
                                   node["lora_b"]) * scale
                if name in TRANSPOSED_KERNELS:
                    delta = jnp.swapaxes(delta, -1, -2)
                out["kernel"] = node["kernel"] + delta.astype(
                    node["kernel"].dtype)
                for k, v in node.items():
                    if k not in ("kernel", "lora_a", "lora_b"):
                        out[k] = rec(v, k)
                return out
            return {k: rec(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [rec(v, name) for v in node]
        return node
    return rec(params)


def trainable_mask(params: Params, sft_modules: Sequence[str]) -> Params:
    """Boolean pytree: True for LoRA leaves and any leaf under an sft module
    (train_ds_medplib.py:316-326 keeps text_hidden_fcs/mask_decoder/lm_head/
    embed_tokens/region_fea_adapter fully trainable alongside LoRA).

    QUANTIZED nodes (holding scale/scale4/scale4h) are always frozen except
    their LoRA adapters — an int8/int4 kernel is not differentiable and the
    QLoRA recipe trains only the bf16 adapters beside it (an sft module
    that was quantized, e.g. lm_head under the serving config, therefore
    freezes; quantize before LoRA injection for stage-3-style training)."""
    def rec(node, path, in_quant):
        if isinstance(node, dict):
            q = in_quant or any(s in node
                                for s in ("scale", "scale4", "scale4h"))
            return {k: rec(v, path + (k,), q) for k, v in node.items()}
        if isinstance(node, list):
            return [rec(v, path + (str(i),), in_quant)
                    for i, v in enumerate(node)]
        is_lora = path and path[-1] in ("lora_a", "lora_b")
        in_sft = any(m in path for m in sft_modules)
        return bool(is_lora or (in_sft and not in_quant))
    return rec(params, (), False)
