"""Whole-stack layer-indexed W8A8 linears for the prefill scan (OPT-IN).

The round-2 perf note (README) identified the structural losses that kept
W8A8 prefill at ~1.08x inside `lax.scan`: (a) the XLA composition
round-trips the int32 product through HBM, and (b) a Pallas kernel fed by
per-layer weight slices forces XLA to MATERIALIZE each slice (hundreds of
MB per layer). This module removes both at once: the quantized projection
stacks ([L, out, in] / [L, in, out] int8, exactly as stored) are passed
WHOLE into ops/pallas/gmm with the layer index as the per-tile group id —
the weight operand is the same loop-invariant buffer every scan step, only
its blocks are DMA'd, the s8 x s8 product accumulates in VMEM, and the
(row x channel) rescale runs at the kernel epilogue.

MEASURED OUTCOME (round 3, end-to-end on v5e): standalone the kernel hits
260 TOPS vs the 183 TF/s bf16 dot (benchmarks/profile_gmm.py), but the
COMPOSED pipeline loses with it — MoE flagship 8.20 masks/s with stacked
attention vs 11.12 without; dense headline 11.24 with the stacked MLP vs
12.62 on the XLA W8A8 composition. The per-layer kernel launches, the
extra activation-quant passes, and the elementwise traffic XLA can no
longer fuse across the pallas_call boundaries (silu(g)*u, residual adds)
eat more than the s8xs8 rate gain. Both paths are therefore OPT-IN A/B
knobs (MEDPLIB_STACK_ATTN=1 / MEDPLIB_STACK_MLP=1 in models/llama.py);
the one whole-stack formulation that WINS — and ships default-on — is
the MoE expert dispatch (models/moe_llama.stack_experts_for_gmm), where
XLA's alternative is the 2x-padded capacity dispatch rather than a fused
dense matmul.

Engages at prefill only, under utils/quantize.dynamic_act_quant — decode
stays on the weight-only XLA path (memory-bound; already at the
weight-read floor). Reference scope: the bitsandbytes LLM.int8 matmul
path, /root/reference/chat.py:101-112.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_ATTN_PROJ = ("q_proj", "k_proj", "v_proj", "o_proj")


def _gmm_shape_ok(n_out: int, k_in: int) -> bool:
    from medplib_tpu.ops.pallas.gmm import _pick_bk
    if _pick_bk(k_in)[1] != 0:          # K would need a padding copy
        return False
    return n_out % 512 == 0 or (n_out <= 512 and n_out % 128 == 0)


def stack_attn_for_w8a8(layers: Params, s_tokens: int) -> Optional[Params]:
    """Whole-stack view of the attention projection stacks, or None.

    Eligible when every projection is weight-only int8 ([L, ., .] kernel +
    per-channel scale, no live LoRA adapters) with shapes the gmm kernel
    streams pad-free, and the prefill is large enough to be MXU-bound.
    q/k/v are stored transposed [L, out, in] (models/llama.init_layer
    "decode-major"); their [L, out, 1] scales are swapped channel-last
    ONCE here (loop-invariant, hoisted by XLA)."""
    if s_tokens < 1024:
        return None
    attn = layers.get("attn")
    if attn is None or not all(n in attn for n in _ATTN_PROJ):
        return None  # packed qkv_proj trees keep the pallas packed path
    out = {}
    for n in _ATTN_PROJ:
        node = attn[n]
        k = node.get("kernel")
        if (not isinstance(node, dict) or "scale" not in node
                or "lora_a" in node
                or getattr(k, "dtype", None) != jnp.int8
                or getattr(k, "ndim", 0) != 3):
            return None
        trans = n != "o_proj"           # o_proj is stored [L, in, out]
        k_in = k.shape[-1] if trans else k.shape[-2]
        n_out = k.shape[-2] if trans else k.shape[-1]
        if not _gmm_shape_ok(n_out, k_in):
            return None
        sc = node["scale"].astype(jnp.float32)
        if trans:                        # [L, N, 1] -> channel-last [L, 1, N]
            sc = jnp.swapaxes(sc, -1, -2)
        out[n] = {"kernel": k, "scale": sc, "transposed": trans}
    return out


_MLP_PROJ = ("gate_proj", "up_proj", "down_proj")


def stack_mlp_for_w8a8(layers: Params, s_tokens: int) -> Optional[Params]:
    """Whole-stack view of the dense SwiGLU projection stacks, or None.

    Same eligibility contract as stack_attn_for_w8a8 (weight-only int8
    stacks, no live LoRA, prefill-sized S). The FFN dim must already be
    gmm-pad-free: utils/quantize.pad_dense_mlp_for_gmm zero-pads M
    (11008 -> 11264) ONCE at serving-prep time, so the [L, H, M'] /
    [L, M', H] stacks stream through the kernel with no in-scan padding
    copy. Unpadded trees (M % 512 != 0) simply stay on the XLA
    weight-only path. Reference scope: the bitsandbytes LLM.int8 matmul
    applied to the MLP, /root/reference/chat.py:101-112."""
    if s_tokens < 1024:
        return None
    mlp = layers.get("mlp")
    if not isinstance(mlp, dict) or not all(n in mlp for n in _MLP_PROJ):
        return None
    out = {}
    for n in _MLP_PROJ:
        node = mlp[n]
        if not isinstance(node, dict):
            return None
        k = node.get("kernel")
        if ("scale" not in node or "lora_a" in node
                or getattr(k, "dtype", None) != jnp.int8
                or getattr(k, "ndim", 0) != 3):
            return None
        k_in, n_out = k.shape[-2], k.shape[-1]   # [L, in, out] storage
        if not _gmm_shape_ok(n_out, k_in):
            return None
        out[n] = {"kernel": k, "scale": node["scale"].astype(jnp.float32),
                  "transposed": False}
    return out


def stacked_dense_mlp(stacks: Params, x: jnp.ndarray, layer_idx,
                      block_m: int = 512) -> jnp.ndarray:
    """Dense SwiGLU MLP via whole-stack layer-indexed W8A8 gmm.

    One activation-quant pass feeds gate and up; the silu(g)*u
    intermediate is re-quantized per row (zero-padded M columns are
    exactly zero — silu(0)*0 — and feed zero down-proj rows, so the
    storage pad never changes the result); all three matmuls accumulate
    s8 x s8 in VMEM with the (row x channel) rescale at the kernel
    epilogue. x [B, T, H] -> [B, T, H] in x.dtype."""
    from medplib_tpu.ops.pallas.gmm import gmm, quantize_rows
    b, t, hdim = x.shape
    xq, xsc, rows = quantize_rows_padded(x.reshape(b * t, hdim), block_m)
    sp = xq.shape[0]
    gid = jnp.full((sp // block_m,), jnp.asarray(layer_idx, jnp.int32),
                   jnp.int32)

    def mm(name, aq, asc):
        node = stacks[name]
        return gmm(aq, node["kernel"], gid, node["scale"], a_scale=asc,
                   block_m=block_m, allow_pad=False)

    g = mm("gate_proj", xq, xsc)
    u = mm("up_proj", xq, xsc)
    aq, asc = quantize_rows(jax.nn.silu(g) * u)
    y = mm("down_proj", aq, asc)
    return y[:rows].reshape(b, t, hdim).astype(x.dtype)


def quantize_rows_padded(x2d: jnp.ndarray, block_m: int = 512):
    """Per-row int8 activation quant with rows zero-padded to block_m
    (padded rows get zero scales -> zero outputs). One pass, shared by all
    projections of the layer that consume the same hidden state.
    -> (x_q [Sp, K] int8, scales [Sp, 1] f32, rows)."""
    from medplib_tpu.ops.pallas.gmm import quantize_rows
    rows = x2d.shape[0]
    pad = -rows % block_m
    xq, sc = quantize_rows(x2d)
    if pad:
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        sc = jnp.pad(sc, ((0, pad), (0, 0)))
    return xq, sc, rows


def stacked_w8a8_linear(node: Params, xq: jnp.ndarray, xsc: jnp.ndarray,
                        layer_idx, rows: int,
                        block_m: int = 512) -> jnp.ndarray:
    """One projection: W8A8 gmm over the whole [L, ., .] stack with every
    m-tile addressed to `layer_idx`. xq/xsc from quantize_rows_padded.
    -> [rows, N] bf16."""
    from medplib_tpu.ops.pallas.gmm import gmm
    sp = xq.shape[0]
    tile_gid = jnp.full((sp // block_m,), jnp.asarray(layer_idx, jnp.int32),
                        jnp.int32)
    y = gmm(xq, node["kernel"], tile_gid, node["scale"], a_scale=xsc,
            block_m=block_m, allow_pad=False,
            transposed=node["transposed"])
    return y[:rows]
