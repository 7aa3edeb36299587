"""Weight-only int8/int4 quantization for inference.

TPU-native counterpart of the reference's bitsandbytes 4/8-bit loading
(/root/reference/chat.py:89-112, builder.py:39-48, including the
skip-visual-modules behavior of `llm_int8_skip_modules=["visual_model"]`):

- int8 (bits=8): per-output-channel symmetric with an f32 scale,
  dequantized inside the matmul fusion. Halves HBM for the 7B weights.
- int4 (bits=4): blockwise symmetric along the reduction axis (the TPU
  analog of bnb NF4's 64-element double-quant blocks, chat.py:94-100),
  two nibbles packed per int8 carrier byte — 0.5 bytes/weight in HBM.
  Native jnp.int4 is avoided deliberately: the TPU runtime plugin cannot
  take int4 arrays as jit arguments; nibble-packed int8 is portable and
  the unpack (two shifts) fuses into the dequant multiply.

Decode is memory-bound, so both directly buy decode throughput and free
room for batch/KV cache. 4-bit nodes carry {"kernel": packed int8,
"scale4": f32 blockwise}; the scale4 key (vs "scale") is what downstream
dispatch keys on.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from medplib_tpu.train.lora import TRANSPOSED_KERNELS

# modules never quantized (normalization-sensitive or tiny); "coefficient"
# is the Residual-MoE 2-way mixing gate — like the router, a softmax gate
# whose numerics must not be quantized
SKIP_MODULES = ("sam", "clip", "text_hidden_fcs", "region_fea_adapter",
                "mask_encoder", "mm_token_compressor", "router",
                "coefficient", "embed_tokens", "norm", "input_layernorm",
                "post_attention_layernorm")


import functools


def _map_leading(fn, kernel: jnp.ndarray, ndim_core: int = 2):
    """Apply a 2D quantizer over stacked leading dims (layer/expert) one
    slice at a time via lax.map: the f32 temporaries then peak at ONE
    slice instead of the whole [L, in, out] stack (whose f32 copy alone is
    ~5.8 GB for a 7B MLP stack — enough to fragment a 16 GB chip so badly
    that a 6.5 GB generate program no longer fits)."""
    lead = kernel.shape[:-ndim_core]
    if not lead:
        return fn(kernel)
    flat = kernel.reshape((-1,) + kernel.shape[-ndim_core:])
    q, s = jax.lax.map(fn, flat)
    return (q.reshape(lead + q.shape[1:]), s.reshape(lead + s.shape[1:]))


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def _quantize_kernel(kernel: jnp.ndarray, out_axis: int):
    """Donated input: the bf16 kernel's HBM is reclaimed as the int8 output
    is produced — quantizing a 7B tree never holds both precisions."""
    core_out_axis = out_axis - (kernel.ndim - 2)  # 0 or 1 within a 2D slice

    def one(k2):
        absmax = jnp.max(jnp.abs(k2.astype(jnp.float32)),
                         axis=1 - core_out_axis, keepdims=True)
        scale = absmax / 127.0
        q = jnp.clip(jnp.round(k2.astype(jnp.float32) /
                               jnp.maximum(scale, 1e-12)), -127, 127
                     ).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    return _map_leading(one, kernel)


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(0,))
def _quantize_kernel4(kernel: jnp.ndarray, transposed: bool, block: int):
    """Blockwise int4 along the reduction axis, nibble-packed into int8.

    Normal [.., in, out] kernels: scale4 [.., nb, 1, out], packed along the
    in axis (even rows in the low nibble, odd rows in the high nibble).
    Transposed [.., out, in]: scale4 [.., out, nb, 1], packed along in.
    dequant (train/lora.dequant_kernel) distinguishes the two by which
    trailing scale4 axis is 1."""

    def one(k2):
        w = k2.astype(jnp.float32)
        if transposed:
            O, I = w.shape
            B = block if I % block == 0 else I
            nb = I // B
            wb = w.reshape(O, nb, B)
            scale = jnp.max(jnp.abs(wb), axis=-1, keepdims=True) / 7.0
        else:
            I, O = w.shape
            B = block if I % block == 0 else I
            nb = I // B
            wb = w.reshape(nb, B, O)
            scale = jnp.max(jnp.abs(wb), axis=-2, keepdims=True) / 7.0
        q = jnp.clip(jnp.round(wb / jnp.maximum(scale, 1e-12)), -8, 7
                     ).astype(jnp.int8).reshape(w.shape)
        axis = q.ndim - 1 if transposed else q.ndim - 2
        lo = jax.lax.slice_in_dim(q, 0, q.shape[axis], 2, axis)
        hi = jax.lax.slice_in_dim(q, 1, q.shape[axis], 2, axis)
        packed = jnp.bitwise_or(jnp.bitwise_and(lo, jnp.int8(15)),
                                jnp.left_shift(hi, 4))
        return packed, scale.astype(jnp.float32)

    return _map_leading(one, kernel)


@functools.partial(jax.jit, static_argnums=(1, 2), donate_argnums=(0,))
def _quantize_kernel4h(kernel: jnp.ndarray, transposed: bool, groups: int):
    """int4 'interleaved pairs' packing (the FAST int4 layout).

    Logical reduction row 2r goes to the LOW nibble of packed row r and
    row 2r + 1 to its HIGH nibble — the exact order the TPU's hardware
    narrowing bitcast produces (`pltpu.bitcast(packed, int4)` emits row 2r
    then 2r + 1; jax mosaic primitives, bitcast lowering), so the Pallas
    kernels unpack a packed block to natural logical order in ONE
    hardware op instead of two i32 shift chains per plane (the shift
    chains were the entire residual fused-decode gap: 21.10 vs 19.83
    ms/step, benchmarks/profile_decode.py, round 5). XLA (non-Pallas)
    consumers pair the lo/hi nibble planes with even/odd activation
    columns (`_split_parity`) so their unpack stays a fusible elementwise
    shift — no materialized bf16 kernel copy (the round-2 failure mode of
    stack+reshape dequant: 5.2 vs 12.6 masks/s at 7B).

    Scales are blockwise along the reduction axis with `groups` contiguous
    LOGICAL groups (groups must be even; a group then covers a contiguous
    range of packed rows with both nibbles): normal [.., K, N] kernels ->
    packed [.., K/2, N] + scale4h [.., G, 1, N]; transposed [.., N, K] ->
    packed [.., N, K/2] + scale4h [.., G, N, 1] (the dequant distinguishes
    layouts by which trailing axis is 1, like scale4)."""
    assert groups % 2 == 0, "groups must be even (pair-aligned boundaries)"

    def one(k2):
        w = k2.astype(jnp.float32)
        if transposed:
            O, I = w.shape
            G = groups if I % groups == 0 else 2
            wb = w.reshape(O, G, I // G)
            scale = jnp.max(jnp.abs(wb), axis=-1, keepdims=True) / 7.0
            q = jnp.clip(jnp.round(wb / jnp.maximum(scale, 1e-12)), -8, 7
                         ).astype(jnp.int8).reshape(O, I)
            lo = jax.lax.slice_in_dim(q, 0, I, 2, 1)
            hi = jax.lax.slice_in_dim(q, 1, I, 2, 1)
            scale = jnp.transpose(scale, (1, 0, 2))  # [O, G, 1] -> [G, O, 1]
        else:
            I, O = w.shape
            G = groups if I % groups == 0 else 2
            wb = w.reshape(G, I // G, O)
            scale = jnp.max(jnp.abs(wb), axis=-2, keepdims=True) / 7.0
            q = jnp.clip(jnp.round(wb / jnp.maximum(scale, 1e-12)), -8, 7
                         ).astype(jnp.int8).reshape(I, O)
            lo = jax.lax.slice_in_dim(q, 0, I, 2, 0)
            hi = jax.lax.slice_in_dim(q, 1, I, 2, 0)
            scale = scale.reshape(G, 1, O)
        packed = jnp.bitwise_or(jnp.bitwise_and(lo, jnp.int8(15)),
                                jnp.left_shift(hi, 4))
        return packed, scale.astype(jnp.float32)

    return _map_leading(one, kernel)


def quantize_tree(params: Any, skip: Sequence[str] = SKIP_MODULES,
                  bits: int = 8, block: int = 64,
                  int4_scheme: str = "half", int4_groups: int = 8) -> Any:
    """Replace eligible linear kernels with quantized pairs: bits=8 ->
    {"kernel": int8, "scale": f32}, bits=4 -> the matmul-fusible
    interleaved-pairs layout {"kernel": packed int8, "scale4h": f32
    groupwise} (int4_scheme="half", the default — decode runs at int8
    speed with half the HBM), or the bnb-NF4-like small-block layout
    {"kernel": packed int8, "scale4": f32 blockwise} (int4_scheme="block";
    finer `block`-element scales but the unpack defeats operand fusion —
    capacity only). LoRA adapters and biases stay full precision."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if int4_scheme not in ("half", "block"):
        raise ValueError(f"unknown int4_scheme {int4_scheme!r}")

    def rec(node, path):
        if isinstance(node, dict):
            if any(s in node for s in ("scale", "scale4", "scale4h")):
                return node  # already quantized (mixed-precision passes)
            if "kernel" in node and not any(s in path for s in skip):
                k = node["kernel"]
                if hasattr(k, "ndim") and k.ndim >= 2 and k.size >= 1 << 12:
                    name = path[-1] if path else ""
                    transposed = name in TRANSPOSED_KERNELS
                    # drop the tree's reference BEFORE quantizing so the
                    # donated buffer is actually freeable
                    node["kernel"] = None
                    if bits == 4 and int4_scheme == "half":
                        # default 8 groups: K/8-element scale blocks (512
                        # for the 4096 attn kernels) — the accuracy knob
                        # that keeps the unpack matmul-fusible.
                        # int4_groups=2 (one scale per nibble half) is the
                        # layout the Pallas gmm_int4h kernel consumes
                        # in-register (ops/pallas/gmm.py)
                        q, scale = _quantize_kernel4h(jnp.asarray(k),
                                                      transposed,
                                                      int4_groups)
                        node["kernel"] = q
                        node["scale4h"] = scale
                    elif bits == 4:
                        q, scale = _quantize_kernel4(jnp.asarray(k),
                                                     transposed, block)
                        node["kernel"] = q
                        node["scale4"] = scale
                    else:
                        out_axis = k.ndim - 2 if transposed else k.ndim - 1
                        q, scale = _quantize_kernel(jnp.asarray(k), out_axis)
                        node["kernel"] = q
                        node["scale"] = scale
                    del k
                    for kk, vv in node.items():
                        if kk not in ("kernel", "scale", "scale4",
                                      "scale4h"):
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


def dequantize_tree(params: Any, dtype=jnp.bfloat16) -> Any:
    """Inverse of quantize_tree: materialize every quantized kernel back to
    `dtype` and drop the scale leaves — so a quantized serving checkpoint
    can round-trip through the HF export (utils/hf_export.medplib_to_hf
    expects float kernels with the original shapes). Mutates the tree."""
    from medplib_tpu.train.lora import dequant_kernel

    def rec(node):
        if isinstance(node, dict):
            if any(s in node for s in ("scale", "scale4", "scale4h")):
                node["kernel"] = dequant_kernel(node, dtype)
                for s in ("scale", "scale4", "scale4h"):
                    node.pop(s, None)
            for v in node.values():
                rec(v)
        elif isinstance(node, list):
            for v in node:
                rec(v)

    rec(params)
    return params


def pad_moe_experts_for_gmm(experts: Any, align: int = 1024) -> Any:
    """Zero-pad the expert FFN dim M up to `align` so the whole-stack
    layer-indexed gmm dispatch (models/moe_llama.stack_experts_for_gmm)
    never needs an internal padding copy of the multi-GB stack inside the
    layer scan: gate/up [.., H, M] -> [.., H, M'], down [.., M, H] ->
    [.., M', H]. EXACT: padded gate/up out-channels are zero so
    silu(0)*0 = 0 flows into zero down-proj rows — every dispatch mode
    (sort/einsum/gmm) computes identical outputs on the padded tree; the
    pad is invisible outside the FFN (down_proj still maps back to H).
    Must be applied to the float tree BEFORE quantization (int4h nibble
    halves must split the padded K). Mutates and returns `experts`."""
    m = experts["gate_proj"]["kernel"].shape[-1]
    mp = -m % align
    if mp == 0:
        return experts
    for n in ("gate_proj", "up_proj", "down_proj"):
        node = experts[n]
        assert not any(s in node for s in ("scale", "scale4", "scale4h")), \
            "pad_moe_experts_for_gmm must run before quantization"
        k = node["kernel"]
        pads = [(0, 0)] * k.ndim
        pads[-1 if n != "down_proj" else -2] = (0, mp)
        node["kernel"] = jnp.pad(k, pads)
    return experts


def pad_dense_mlp_for_gmm(mlp: Any, align: int = 1024) -> Any:
    """Dense-path sibling of pad_moe_experts_for_gmm: zero-pad the dense
    SwiGLU FFN dim M (gate/up [L, H, M] -> [L, H, M'], down [L, M, H] ->
    [L, M', H]) so the whole-stack layer-indexed W8A8 prefill
    (ops/stacked.stack_mlp_for_w8a8) streams the stacks pad-free. EXACT
    for the same reason (zero out-channels -> silu(0)*0 = 0 -> zero
    down-proj rows). Unlike the expert variant this may also run AFTER
    int8 quantization: the int8 kernel and its per-channel `scale` pad
    together (padded channels carry zero scales), which avoids holding a
    padded bf16 copy of the 7B MLP stacks on a 16 GB chip. int4 layouts
    must still pad before quantization. Mutates and returns `mlp`."""
    m = mlp["gate_proj"]["kernel"].shape[-1]
    mp = -m % align
    if mp == 0:
        return mlp
    for n in ("gate_proj", "up_proj", "down_proj"):
        node = mlp[n]
        assert not any(s in node for s in ("scale4", "scale4h")), \
            "int4 layouts must be padded before quantization"
        k = node["kernel"]
        pads = [(0, 0)] * k.ndim
        pads[-1 if n != "down_proj" else -2] = (0, mp)
        node["kernel"] = jnp.pad(k, pads)
        if "scale" in node and n != "down_proj":
            # per-out-channel scale [L, 1, M] tracks the padded out axis;
            # down_proj's pad is on its IN axis — scale [L, 1, H] unchanged
            node["scale"] = jnp.pad(node["scale"], ((0, 0),) * (
                node["scale"].ndim - 1) + ((0, mp),))
    return mlp


def quantize_flagship_moe(params: Any, expert_bits: int = 4,
                          attn_bits: int = 8) -> Any:
    """Mixed-precision quantization for the full-depth MoE flagship
    (MedPLIB-7b-2e, 32L x 2 experts ~= 13B params): the expert stacks —
    2/3 of the weights — go int4 (interleaved-pairs fast layout), the
    attention/dense path int8. ~7 GB total on-chip for the LLM, which is
    what fits the 16 GB v5e alongside KV cache + towers at a useful batch.
    Routers/norms/embeddings stay full precision (SKIP_MODULES).

    int4 experts use per-HALF scales (int4_groups=2, one scale per nibble
    half per output channel) — the layout the Pallas gmm_int4h kernel
    streams in-register at prefill (ops/pallas/gmm.py). vs the default 8
    groups this coarsens the absmax window ~4x along K, which moves the
    quant step only ~10% for near-Gaussian weights (absmax grows like
    sqrt(2 ln n)); the prefill-path win is structural."""
    moe = params["llm"]["layers"].get("moe")
    if moe is not None:
        # pre-pad M so the whole-stack gmm prefill path never copies the
        # expert stacks inside the layer scan (pad_moe_experts_for_gmm)
        moe["experts"] = pad_moe_experts_for_gmm(moe["experts"])
    if moe is not None and expert_bits != attn_bits:
        moe["experts"] = quantize_tree(moe["experts"], skip=(),
                                       bits=expert_bits, int4_groups=2)
    return quantize_tree(params, bits=attn_bits)


# ---------------------------------------------------------------------------
# int4 interleaved-pairs matmuls (fusible dequant)
# ---------------------------------------------------------------------------
# The pairs packing (logical rows 2r / 2r+1 in packed row r's lo/hi
# nibbles) exists for the Pallas kernels' hardware bitcast unpack; the XLA
# composition keeps fusibility by pairing nibble PLANES with activation
# column PARITIES: y_g = x_even @ lo(p_g) + x_odd @ hi(p_g), one pair of
# grouped dots per scale group, each unpack a pure elementwise shift that
# fuses into the dot operand read. HBM sees only packed int4 bytes — the
# traffic is 2 x 0.5 = 1 byte/weight (each packed slice read by its two
# plane dots), i.e. int8-equal decode speed at half the capacity, vs the
# stack+reshape dequant's materialized bf16 copy (4.5 bytes/weight).


def _unpack(p: jnp.ndarray, low: bool, dtype) -> jnp.ndarray:
    if low:  # arithmetic shifts sign-extend
        return jnp.right_shift(jnp.left_shift(p, 4), 4).astype(dtype)
    return jnp.right_shift(p, 4).astype(dtype)


def _split_parity(x: jnp.ndarray):
    """Even / odd columns of the logical-K activation — the halves that
    multiply the lo / hi nibble planes under the pairs packing."""
    k = x.shape[-1]
    return (jax.lax.slice_in_dim(x, 0, k, 2, -1),
            jax.lax.slice_in_dim(x, 1, k, 2, -1))


def int4h_matmul(x: jnp.ndarray, packed: jnp.ndarray,
                 scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant(packed [K/2, N] pairs, scale4h [G, 1, N])."""
    g_n = scale.shape[-3]
    gs2 = packed.shape[-2] // g_n              # packed rows per group
    xe, xo = _split_parity(x)
    y = None
    for g in range(g_n):
        pg = jax.lax.slice_in_dim(packed, g * gs2, (g + 1) * gs2, axis=-2)
        xeg = jax.lax.slice_in_dim(xe, g * gs2, (g + 1) * gs2, axis=-1)
        xog = jax.lax.slice_in_dim(xo, g * gs2, (g + 1) * gs2, axis=-1)
        yg = (xeg @ _unpack(pg, True, x.dtype)
              + xog @ _unpack(pg, False, x.dtype))
        yg = yg * scale[g, 0].astype(x.dtype)
        y = yg if y is None else y + yg
    return y


def int4h_matmul_t(x: jnp.ndarray, packed: jnp.ndarray,
                   scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant(packed [N, K/2] pairs, scale4h [G, N, 1]).T."""
    g_n = scale.shape[-3]
    gs2 = packed.shape[-1] // g_n
    xe, xo = _split_parity(x)
    y = None
    for g in range(g_n):
        pg = jax.lax.slice_in_dim(packed, g * gs2, (g + 1) * gs2, axis=-1)
        xeg = jax.lax.slice_in_dim(xe, g * gs2, (g + 1) * gs2, axis=-1)
        xog = jax.lax.slice_in_dim(xo, g * gs2, (g + 1) * gs2, axis=-1)
        yg = (jnp.einsum("...i,oi->...o", xeg, _unpack(pg, True, x.dtype))
              + jnp.einsum("...i,oi->...o", xog,
                           _unpack(pg, False, x.dtype)))
        yg = yg * scale[g, :, 0].astype(x.dtype)
        y = yg if y is None else y + yg
    return y


def int4h_expert_einsum(x: jnp.ndarray, packed: jnp.ndarray,
                        scale: jnp.ndarray) -> jnp.ndarray:
    """MoE expert contraction: einsum('ech,ehm->ecm') over int4h experts.
    x [E, C, K]; packed [E, K/2, M] pairs; scale4h [E, G, 1, M]."""
    g_n = scale.shape[-3]
    gs2 = packed.shape[-2] // g_n
    xe, xo = _split_parity(x)
    y = None
    for g in range(g_n):
        pg = jax.lax.slice_in_dim(packed, g * gs2, (g + 1) * gs2, axis=1)
        xeg = jax.lax.slice_in_dim(xe, g * gs2, (g + 1) * gs2, axis=-1)
        xog = jax.lax.slice_in_dim(xo, g * gs2, (g + 1) * gs2, axis=-1)
        yg = (jnp.einsum("ecg,egm->ecm", xeg, _unpack(pg, True, x.dtype))
              + jnp.einsum("ecg,egm->ecm", xog,
                           _unpack(pg, False, x.dtype)))
        yg = yg * scale[:, g].astype(x.dtype)[:, None, 0, :]
        y = yg if y is None else y + yg
    return y


def dequant_int4h(packed: jnp.ndarray, scale: jnp.ndarray,
                  dtype) -> jnp.ndarray:
    """Materializing dequant for the pairs layout (parity tests, export).
    Normal: packed [.., K/2, N] + scale [.., G, 1, N] -> [.., K, N];
    transposed: packed [.., N, K/2] + scale [.., G, N, 1] -> [.., N, K].
    Interleaves the nibble planes (logical rows 2r / 2r+1 from packed row
    r) — a materializing stack+reshape, fine here: this path never runs
    in a hot loop."""
    transposed = scale.shape[-1] == 1
    axis = packed.ndim - 1 if transposed else packed.ndim - 2
    lo = _unpack(packed, True, jnp.float32)
    hi = _unpack(packed, False, jnp.float32)
    w = jnp.stack([lo, hi], axis=axis + 1)
    w = w.reshape(w.shape[:axis] + (2 * packed.shape[axis],)
                  + packed.shape[axis + 1:])
    g_n = scale.shape[-3]
    if transposed:
        *lead, o, k = w.shape
        wb = w.reshape(*lead, o, g_n, k // g_n)
        s = jnp.moveaxis(scale, -3, -2)  # [.., G, O, 1] -> [.., O, G, 1]
        return (wb * s).reshape(w.shape).astype(dtype)
    *lead, k, o = w.shape
    wb = w.reshape(*lead, g_n, k // g_n, o)
    return (wb * scale[..., :, :, :]).reshape(w.shape).astype(dtype)


# ---------------------------------------------------------------------------
# Dynamic activation quantization (W8A8 prefill)
# ---------------------------------------------------------------------------
# v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate. For the
# compute-bound prefill, quantizing activations per-row at runtime
# (symmetric absmax, the SmoothQuant/LLM.int8-style dynamic scheme) and
# issuing the matmul in int8 nearly halves the dominant cost. Decode stays
# weight-only (memory-bound: activation quant buys nothing and costs
# fidelity). Opt-in via the `dynamic_act_quant()` context (trace-time
# flag); the serving bench enables it with BENCH_ACTQ=1.

import contextlib
import threading

_ACT_QUANT = threading.local()


def act_quant_enabled() -> bool:
    return getattr(_ACT_QUANT, "on", False)


@contextlib.contextmanager
def dynamic_act_quant(enabled: bool = True):
    """Enable W8A8 dynamic-activation matmuls for int8 weight nodes while
    TRACING under this context (jit captures the choice)."""
    prev = act_quant_enabled()
    _ACT_QUANT.on = enabled
    try:
        yield
    finally:
        _ACT_QUANT.on = prev


def int8_dyn_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                    transposed: bool) -> jnp.ndarray:
    """y = x @ dequant(w) computed as (quant(x) @ w_q) * scales on the int8
    MXU path. x [..., K] any float dtype; w_q [K, N] (+scale [1, N]) or
    [N, K] (+scale [N, 1]) when transposed; per-row symmetric activation
    scales.

    Headline-bench ladder at 7B int8 B=12 (v5e): baseline 12.0; this XLA
    composition 12.29; the naive fused Pallas kernel 8.94 (VMEM budget at
    K=11008 forced bm<=128 so weights re-streamed per tiny m-block); the
    K-blocked Pallas kernel (ops/pallas/int8_matmul.w8a8_matmul*, int32
    accumulator in VMEM scratch) 10.2 — better but still behind XLA, whose
    emitter fuses the quant/rescale around the dot inside the layer scan
    where every pallas_call operand is a materialized slice copy. The raw
    s8xs8 MXU dot is 1.94x bf16 (373 vs 192 TF/s); the XLA composition
    keeps ~2.4% end-to-end of it and remains the dispatch. The Pallas
    kernels stay available for unstacked (non-scan) callers."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    a_scale = jnp.maximum(absmax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    if transposed:
        y32 = jax.lax.dot_general(
            x_q, w_q, (((x_q.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        w_s = w_scale.reshape(1, -1)
    else:
        y32 = jax.lax.dot_general(
            x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        w_s = w_scale.reshape(1, -1)
    y = y32.astype(jnp.float32) * a_scale * w_s
    return y.astype(x.dtype)
