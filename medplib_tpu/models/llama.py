"""Dense LLaMA decoder, TPU-first.

Functional rebuild of the LLM core the reference gets from HF
`LlamaForCausalLM` (/root/reference/model/medplib/model/language_model/
medplib_llama.py:28-185), designed for XLA:

- layer stack is a single `lax.scan` over stacked per-layer params (one
  compiled layer body, fast compile, natural remat point)
- params are plain nested dicts; shardings come from
  medplib_tpu.parallel.mesh path rules
- prefill and single-step cached decode are separate jit-friendly entry
  points with static shapes (max_seq KV cache written via dynamic slices)

The MLP is pluggable (`mlp_apply`): the MoE variant (models/moe_llama.py)
reuses this exact block with an expert-parallel MLP.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from medplib_tpu.config import LlamaConfig
from medplib_tpu.ops.attention import causal_attention, decode_attention
from medplib_tpu.ops.initializers import dense_init, embed_init
from medplib_tpu.ops.norms import rms_norm
from medplib_tpu.ops.rope import apply_rope, rope_cos_sin
from medplib_tpu.train.lora import (linear as lora_linear,
                                    linear_t as lora_linear_t)

Params = Dict[str, Any]


class KVCache(NamedTuple):
    """Static-shape KV cache. k/v: [L, B, MAX, KV_HEADS, D]; length: [B].

    With `quant=True` (int8 KV, VERDICT round-2 task 7) k/v are int8 and
    k_scale/v_scale carry per-token-per-head f32 absmax scales
    [L, B, MAX, KV_HEADS, 1] — cache HBM halves, which is decode's
    bottleneck; dequant fuses into the attention read
    (ops/attention.decode_attention_quant)."""

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @staticmethod
    def init(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16,
             quant: bool = False):
        shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
        if quant:
            sshape = shape[:-1] + (1,)
            return KVCache(
                k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                length=jnp.zeros((batch,), jnp.int32),
                k_scale=jnp.zeros(sshape, jnp.float32),
                v_scale=jnp.zeros(sshape, jnp.float32))
        return KVCache(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            length=jnp.zeros((batch,), jnp.int32))

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_layer(key, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 7)
    h, q_dim = cfg.hidden_size, cfg.num_heads * cfg.head_dim
    kv_dim = cfg.num_kv_heads * cfg.head_dim
    return {
        "input_layernorm": {"weight": jnp.ones((h,), dtype)},
        "attn": {
            # q/k/v kernels are stored TRANSPOSED [out, in] ("decode-major"):
            # the single-token decode matmul wants the contracting dim
            # minor-most, and storing it that way saves XLA a full relayout
            # copy of the stacked weights (3GB at 7B) in generate programs
            "q_proj": {"kernel": dense_init(ks[0], h, q_dim, dtype).T},
            "k_proj": {"kernel": dense_init(ks[1], h, kv_dim, dtype).T},
            "v_proj": {"kernel": dense_init(ks[2], h, kv_dim, dtype).T},
            "o_proj": {"kernel": dense_init(ks[3], q_dim, h, dtype)},
        },
        "post_attention_layernorm": {"weight": jnp.ones((h,), dtype)},
        "mlp": init_mlp(ks[4], cfg, dtype),
    }


def init_mlp(key, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    h, m = cfg.hidden_size, cfg.intermediate_size
    return {
        "gate_proj": {"kernel": dense_init(k1, h, m, dtype)},
        "up_proj": {"kernel": dense_init(k2, h, m, dtype)},
        "down_proj": {"kernel": dense_init(k3, m, h, dtype)},
    }


def init_llama(key, cfg: LlamaConfig, dtype=jnp.float32,
               vocab_size: Optional[int] = None) -> Params:
    vocab = vocab_size or cfg.vocab_size
    k_emb, k_layers, k_head = jax.random.split(key, 3)
    layer_keys = jax.random.split(k_layers, cfg.num_layers)
    layers = jax.vmap(lambda k: init_layer(k, cfg, dtype))(layer_keys)
    return {
        "embed_tokens": {"embedding": embed_init(k_emb, vocab,
                                                 cfg.hidden_size, dtype)},
        "layers": layers,
        "norm": {"weight": jnp.ones((cfg.hidden_size,), dtype)},
        "lm_head": {"kernel": dense_init(k_head, cfg.hidden_size, vocab, dtype)},
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def dense_mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU: down(silu(gate(x)) * up(x)). LoRA-aware linears."""
    if "gateup_proj" in p:  # inference-packed (pack_inference)
        gp = p["gateup_proj"]
        if "scale" in gp and gp["kernel"].dtype == jnp.int8:
            # Pallas int8 matmul: XLA materializes a bf16 copy of the wide
            # dequantized kernel otherwise (ops/pallas/int8_matmul.py)
            from medplib_tpu.ops.pallas.int8_matmul import int8_matmul
            gu = int8_matmul(x, gp["kernel"], gp["scale"])
        elif "scale4h" in gp:
            from medplib_tpu.ops.pallas.int4_matmul import int4h_matmul_pallas
            gu = int4h_matmul_pallas(x, gp["kernel"], gp["scale4h"])
        else:
            gu = lora_linear(gp, x)
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = lora_linear(p["gate_proj"], x)
        up = lora_linear(p["up_proj"], x)
    return lora_linear(p["down_proj"], jax.nn.silu(gate) * up)


def dense_mlp_layer(layer_params: Params, x: jnp.ndarray):
    """Default MlpApply: full layer params in, (output, aux_loss) out. The
    MoE variant plugs in moe_llama.moe_mlp_layer here."""
    return dense_mlp(layer_params["mlp"], x), jnp.zeros((), jnp.float32)


def _qkv(p: Params, x: jnp.ndarray, cfg: LlamaConfig, cos, sin,
         stacked: Optional[Params] = None, layer_idx=None):
    b, t, _ = x.shape
    if stacked is not None:
        # whole-stack layer-indexed W8A8 projections (ops/stacked.py): one
        # shared activation-quant pass, three gmm calls addressed into the
        # loop-invariant [L, out, in] stacks — no per-layer slice copies
        from medplib_tpu.ops.stacked import (quantize_rows_padded,
                                             stacked_w8a8_linear)
        xq, xsc, rows = quantize_rows_padded(x.reshape(b * t, -1))
        q = stacked_w8a8_linear(stacked["q_proj"], xq, xsc, layer_idx, rows)
        k = stacked_w8a8_linear(stacked["k_proj"], xq, xsc, layer_idx, rows)
        v = stacked_w8a8_linear(stacked["v_proj"], xq, xsc, layer_idx, rows)
        q = q.reshape(b, t, cfg.num_heads, cfg.head_dim).astype(x.dtype)
        k = k.reshape(b, t, cfg.num_kv_heads, cfg.head_dim).astype(x.dtype)
        v = v.reshape(b, t, cfg.num_kv_heads, cfg.head_dim).astype(x.dtype)
        return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v
    if "qkv_proj" in p:  # inference-packed: one wide matmul (pack_inference)
        qp = p["qkv_proj"]
        if "scale" in qp and qp["kernel"].dtype == jnp.int8:
            from medplib_tpu.ops.pallas.int8_matmul import int8_matmul_t
            qkv = int8_matmul_t(x, qp["kernel"], qp["scale"])
        elif "scale4h" in qp:
            from medplib_tpu.ops.pallas.int4_matmul import (
                int4h_matmul_t_pallas)
            qkv = int4h_matmul_t_pallas(x, qp["kernel"], qp["scale4h"])
        else:
            qkv = lora_linear_t(qp, x)
        qd = cfg.num_heads * cfg.head_dim
        kd = cfg.num_kv_heads * cfg.head_dim
        q = qkv[..., :qd].reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = qkv[..., qd:qd + kd].reshape(b, t, cfg.num_kv_heads,
                                         cfg.head_dim)
        v = qkv[..., qd + kd:].reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    else:
        q = lora_linear_t(p["q_proj"], x).reshape(b, t, cfg.num_heads,
                                                  cfg.head_dim)
        k = lora_linear_t(p["k_proj"], x).reshape(b, t, cfg.num_kv_heads,
                                                  cfg.head_dim)
        v = lora_linear_t(p["v_proj"], x).reshape(b, t, cfg.num_kv_heads,
                                                  cfg.head_dim)
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


# (full layer params, normed hidden) -> (mlp output, aux loss scalar)
MlpApply = Callable[[Params, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


def decoder_layer_prefill(
    p: Params, x: jnp.ndarray, cfg: LlamaConfig, cos, sin,
    attn_mask: Optional[jnp.ndarray], mlp_apply: MlpApply,
    attn_stacked: Optional[Params] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    li = p.get("layer_idx") if attn_stacked is not None else None
    h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
    q, k, v = _qkv(p["attn"], h, cfg, cos, sin, attn_stacked, li)
    attn = causal_attention(q, k, v, attn_mask)
    b, t = x.shape[:2]
    if attn_stacked is not None:
        from medplib_tpu.ops.stacked import (quantize_rows_padded,
                                             stacked_w8a8_linear)
        aq, asc, rows = quantize_rows_padded(attn.reshape(b * t, -1))
        o = stacked_w8a8_linear(attn_stacked["o_proj"], aq, asc, li, rows)
        x = x + o.reshape(b, t, -1).astype(x.dtype)
    else:
        x = x + lora_linear(p["attn"]["o_proj"], attn.reshape(b, t, -1))
    h = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    y, aux = mlp_apply(p, h)
    return x + y, (k, v), aux


def decoder_layer_decode(
    p: Params, x: jnp.ndarray, cfg: LlamaConfig, cos, sin,
    k_cache: jnp.ndarray, v_cache: jnp.ndarray, length: jnp.ndarray,
    mlp_apply: MlpApply,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """x: [B, 1, H]. Writes k/v at per-batch position `length` and attends to
    the first length+1 cache entries."""
    h = rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
    q, k, v = _qkv(p["attn"], h, cfg, cos, sin)

    b = x.shape[0]
    bidx = jnp.arange(b)
    k_cache = k_cache.at[bidx, length].set(k[:, 0])
    v_cache = v_cache.at[bidx, length].set(v[:, 0])
    attn = decode_attention(q, k_cache, v_cache, length + 1)
    x = x + lora_linear(p["attn"]["o_proj"], attn.reshape(b, 1, -1))
    h = rms_norm(x, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    y, _ = mlp_apply(p, h)
    return x + y, (k_cache, v_cache)


def forward(
    params: Params,
    cfg: LlamaConfig,
    input_embeds: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    mlp_apply: MlpApply = dense_mlp_layer,
    cache: Optional[KVCache] = None,
    remat: bool = False,
    unroll: bool = False,
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Prefill forward over the full layer stack.

    input_embeds: [B, T, H] (token embedding and multimodal splice happen
    upstream — mirrors `inputs_embeds` in the reference's
    prepare_inputs_labels_for_multimodal contract, medplib_arch.py:217-527).

    Returns (hidden_post_norm [B, T, H], cache'|None, aux_loss). When `cache` is given,
    the freshly computed K/V are written at positions [0, T) and
    cache.length is set from attn_mask row sums (left-aligned sequences).
    """
    b, t, _ = input_embeds.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    # whole-stack layer-indexed W8A8 attention projections (ops/stacked.py):
    # engages under dynamic_act_quant on int8 trees at prefill sizes. The
    # stacks are then REMOVED from the scanned xs (their per-layer slices
    # would otherwise be materialized to feed the pallas_call) and the
    # layer index rides the scan instead.
    from medplib_tpu.utils.quantize import act_quant_enabled
    attn_stacked = None
    mlp_stacked = None
    layers_xs = params["layers"]
    if not unroll and act_quant_enabled():
        # OPT-IN (measured loss): at attention shapes (N=4096, 4 kernel
        # launches + a quant pass per layer) the gmm formulation LOSES to
        # the XLA weight-only composition end-to-end — MoE flagship B=8
        # measured 8.20 masks/s with it vs 11.12 without (round 3). The
        # FFN-shaped stacked paths (experts via ops/moe, dense MLP below)
        # are where the s8xs8 win is real; keep this one as an A/B knob.
        if os.environ.get("MEDPLIB_STACK_ATTN", "0") == "1":
            from medplib_tpu.ops.stacked import stack_attn_for_w8a8
            attn_stacked = stack_attn_for_w8a8(layers_xs, b * t)
        # OPT-IN (measured loss): the dense-MLP gmm variant measured 11.24
        # masks/s vs 12.62 for the XLA W8A8 composition at the headline
        # config (round 3) — same composed-pipeline verdict as the
        # attention stacks above. The expert gmm (ops/moe) is the one
        # whole-stack path that wins: there XLA's alternative is the 2x-
        # padded capacity dispatch, not a fused dense matmul.
        if (mlp_apply is dense_mlp_layer
                and os.environ.get("MEDPLIB_STACK_MLP", "0") == "1"):
            from medplib_tpu.ops.stacked import stack_mlp_for_w8a8
            mlp_stacked = stack_mlp_for_w8a8(layers_xs, b * t)
    if attn_stacked is not None or mlp_stacked is not None:
        layers_xs = dict(layers_xs)
        if attn_stacked is not None:
            attn_xs = dict(layers_xs["attn"])
            for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
                del attn_xs[name]
            layers_xs["attn"] = attn_xs
        if mlp_stacked is not None:
            mlp_xs = dict(layers_xs["mlp"])
            for name in ("gate_proj", "up_proj", "down_proj"):
                del mlp_xs[name]
            layers_xs["mlp"] = mlp_xs
        layers_xs.setdefault("layer_idx",
                             jnp.arange(cfg.num_layers, dtype=jnp.int32))

    if mlp_stacked is not None:
        from medplib_tpu.ops.stacked import stacked_dense_mlp

        def mlp_apply(layer_p, h, _stacks=mlp_stacked):  # noqa: F811
            return (stacked_dense_mlp(_stacks, h, layer_p["layer_idx"]),
                    jnp.zeros((), jnp.float32))

    def body(x, layer_p):
        x, kv, aux = decoder_layer_prefill(layer_p, x, cfg, cos, sin,
                                           attn_mask, mlp_apply,
                                           attn_stacked)
        return x, (kv, aux)

    if remat:
        body = jax.checkpoint(body)
    if unroll:
        # python-unrolled layers: per-layer weight slices keep their natural
        # layout — lax.scan over stacked [L, in, out] kernels makes XLA
        # relayout-copy the whole stack (1GB/kernel at 7B), which blows HBM
        # on single-chip inference
        x = input_embeds
        ks_l, vs_l, aux_l = [], [], []
        for i in range(cfg.num_layers):
            layer_p = jax.tree_util.tree_map(lambda a, i=i: a[i],
                                             params["layers"])
            x, (k, v), aux = decoder_layer_prefill(
                layer_p, x, cfg, cos, sin, attn_mask, mlp_apply)
            ks_l.append(k)
            vs_l.append(v)
            aux_l.append(aux)
        ks, vs = jnp.stack(ks_l), jnp.stack(vs_l)
        aux_loss = jnp.sum(jnp.stack(aux_l))
    else:
        x, ((ks, vs), aux_losses) = jax.lax.scan(body, input_embeds,
                                                 layers_xs)
        aux_loss = jnp.sum(aux_losses)
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)

    new_cache = None
    if cache is not None:
        max_len = cache.k.shape[2]
        pad = max_len - t
        if attn_mask is not None:
            length = jnp.sum(attn_mask.astype(jnp.int32), axis=-1)
        else:
            length = jnp.full((b,), t, jnp.int32)

        def padt(a):
            return jnp.pad(a, ((0, 0), (0, 0), (0, pad)) +
                           ((0, 0),) * (a.ndim - 3))

        if cache.quantized:
            from medplib_tpu.ops.attention import quantize_kv
            kq, ksc = quantize_kv(ks)
            vq, vsc = quantize_kv(vs)
            new_cache = KVCache(k=padt(kq), v=padt(vq), length=length,
                                k_scale=padt(ksc), v_scale=padt(vsc))
        else:
            new_cache = KVCache(k=padt(ks).astype(cache.k.dtype),
                                v=padt(vs).astype(cache.v.dtype),
                                length=length)
    return x, new_cache, aux_loss


def forward_decode(
    params: Params,
    cfg: LlamaConfig,
    input_embeds: jnp.ndarray,
    cache: KVCache,
    mlp_apply: MlpApply = dense_mlp_layer,
    unroll: bool = False,
) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step. input_embeds [B, 1, H] -> (hidden [B, 1, H], cache')."""
    positions = cache.length[:, None]  # [B, 1]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    if unroll:
        if cache.quantized:
            raise NotImplementedError(
                "int8 KV cache is scan-path only (unroll_layers is a "
                "measured-slower ladder knob, models/llama.py forward)")
        x = input_embeds
        ks_l, vs_l = [], []
        for i in range(cfg.num_layers):
            layer_p = jax.tree_util.tree_map(lambda a, i=i: a[i],
                                             params["layers"])
            x, (k_c, v_c) = decoder_layer_decode(
                layer_p, x, cfg, cos, sin, cache.k[i], cache.v[i],
                cache.length, mlp_apply)
            ks_l.append(k_c)
            vs_l.append(v_c)
        ks, vs = jnp.stack(ks_l), jnp.stack(vs_l)
        kss = vss = None
    else:
        # The FULL cache rides the scan CARRY and only the new token slots
        # are scattered in. Passing per-layer caches as scan xs and
        # collecting the updated slices as ys restacks the whole
        # [L, B, MAX, KV, D] cache every decode step (~8 GB of HBM writes
        # at 7B/B=12 — measured as ~2/3 of the step time); in-place carry
        # scatters write B*KV*D elements per layer instead.
        quant = cache.quantized

        def body(carry, layer_in):
            x, ks, vs, kss, vss = carry
            layer_p, i = layer_in
            h = rms_norm(x, layer_p["input_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            q, k, v = _qkv(layer_p["attn"], h, cfg, cos, sin)
            b = x.shape[0]
            bidx = jnp.arange(b)
            if quant:
                from medplib_tpu.ops.attention import (
                    decode_attention_quant, quantize_kv)
                kq, ksc = quantize_kv(k[:, 0])
                vq, vsc = quantize_kv(v[:, 0])
                ks = ks.at[i, bidx, cache.length].set(kq)
                vs = vs.at[i, bidx, cache.length].set(vq)
                kss = kss.at[i, bidx, cache.length].set(ksc)
                vss = vss.at[i, bidx, cache.length].set(vsc)
                idx = lambda a: jax.lax.dynamic_index_in_dim(  # noqa: E731
                    a, i, 0, keepdims=False)
                attn = decode_attention_quant(q, idx(ks), idx(kss),
                                              idx(vs), idx(vss),
                                              cache.length + 1)
            else:
                ks = ks.at[i, bidx, cache.length].set(k[:, 0])
                vs = vs.at[i, bidx, cache.length].set(v[:, 0])
                k_c = jax.lax.dynamic_index_in_dim(ks, i, 0, keepdims=False)
                v_c = jax.lax.dynamic_index_in_dim(vs, i, 0, keepdims=False)
                attn = decode_attention(q, k_c, v_c, cache.length + 1)
            x = x + lora_linear(layer_p["attn"]["o_proj"],
                                attn.reshape(b, 1, -1))
            h = rms_norm(x, layer_p["post_attention_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            y, _ = mlp_apply(layer_p, h)
            return (x + y, ks, vs, kss, vss), ()

        (x, ks, vs, kss, vss), _ = jax.lax.scan(
            body, (input_embeds, cache.k, cache.v, cache.k_scale,
                   cache.v_scale),
            (params["layers"], jnp.arange(cfg.num_layers)))
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return x, KVCache(k=ks, v=vs, length=cache.length + 1,
                      k_scale=kss, v_scale=vss)


def forward_extend(
    params: Params,
    cfg: LlamaConfig,
    input_embeds: jnp.ndarray,
    cache: KVCache,
    c0: jnp.ndarray,
    mlp_apply: MlpApply = dense_mlp_layer,
) -> Tuple[jnp.ndarray, KVCache]:
    """CHUNKED-PREFILL extend: append C prompt tokens at absolute positions
    [c0, c0+C) to a (possibly partially filled) cache and attend each query
    causally to everything written so far — the serving engine dispatches
    these chunks interleaved with shared-batch decode chunks so one
    request's prefill does not stall every in-flight stream for its whole
    length (reference concurrency surface: model_worker.py:577-592).

    input_embeds [B, C, H]; c0 is a traced scalar (ONE compiled program
    serves every chunk position). cache.length is NOT advanced — the
    caller sets it from the prompt mask after the last chunk
    (medplib.stream_prefill_finish). Same in-place carry-scatter cache
    discipline as forward_decode (the restack trap documented there)."""
    from medplib_tpu.ops.attention import (extend_attention,
                                           extend_attention_quant,
                                           quantize_kv)

    b, c, _ = input_embeds.shape
    positions = jnp.broadcast_to(c0 + jnp.arange(c)[None], (b, c))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    quant = cache.quantized

    def body(carry, layer_in):
        x, ks, vs, kss, vss = carry
        layer_p, i = layer_in
        h = rms_norm(x, layer_p["input_layernorm"]["weight"],
                     cfg.rms_norm_eps)
        q, k, v = _qkv(layer_p["attn"], h, cfg, cos, sin)
        if quant:
            kq, ksc = quantize_kv(k)     # [B, C, KV, D] / [B, C, KV, 1]
            vq, vsc = quantize_kv(v)
            ks = jax.lax.dynamic_update_slice(ks, kq[None], (i, 0, c0, 0, 0))
            vs = jax.lax.dynamic_update_slice(vs, vq[None], (i, 0, c0, 0, 0))
            kss = jax.lax.dynamic_update_slice(kss, ksc[None],
                                               (i, 0, c0, 0, 0))
            vss = jax.lax.dynamic_update_slice(vss, vsc[None],
                                               (i, 0, c0, 0, 0))
            idx = lambda a: jax.lax.dynamic_index_in_dim(  # noqa: E731
                a, i, 0, keepdims=False)
            attn = extend_attention_quant(q, idx(ks), idx(kss), idx(vs),
                                          idx(vss), c0)
        else:
            ks = jax.lax.dynamic_update_slice(
                ks, k[None].astype(ks.dtype), (i, 0, c0, 0, 0))
            vs = jax.lax.dynamic_update_slice(
                vs, v[None].astype(vs.dtype), (i, 0, c0, 0, 0))
            k_c = jax.lax.dynamic_index_in_dim(ks, i, 0, keepdims=False)
            v_c = jax.lax.dynamic_index_in_dim(vs, i, 0, keepdims=False)
            attn = extend_attention(q.astype(k_c.dtype), k_c, v_c, c0)
        x = x + lora_linear(layer_p["attn"]["o_proj"],
                            attn.astype(x.dtype).reshape(b, c, -1))
        h = rms_norm(x, layer_p["post_attention_layernorm"]["weight"],
                     cfg.rms_norm_eps)
        y, _ = mlp_apply(layer_p, h)
        return (x + y, ks, vs, kss, vss), ()

    (x, ks, vs, kss, vss), _ = jax.lax.scan(
        body, (input_embeds, cache.k, cache.v, cache.k_scale, cache.v_scale),
        (params["layers"], jnp.arange(cfg.num_layers)))
    x = rms_norm(x, params["norm"]["weight"], cfg.rms_norm_eps)
    return x, KVCache(k=ks, v=vs, length=cache.length,
                      k_scale=kss, v_scale=vss)


def embed(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Token ids -> embeddings; negative sentinel ids (IMAGE_TOKEN_INDEX etc.)
    are clamped to 0 — callers overwrite those positions with spliced
    features."""
    ids = jnp.maximum(input_ids, 0)
    return jnp.take(params["embed_tokens"]["embedding"], ids, axis=0)


def logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    return lora_linear(params["lm_head"], hidden).astype(jnp.float32)


import functools as _functools


@_functools.partial(jax.jit, static_argnums=(3,), donate_argnums=(0, 1, 2))
def _packed_concat(a, b, c, axis):
    return jnp.concatenate([a, b, c], axis=axis)


@_functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0, 1))
def _packed_concat2(a, b, axis):
    return jnp.concatenate([a, b], axis=axis)


def pack_inference(llm_params: Params) -> Params:
    """Inference-time weight packing: fuse q/k/v into one [*, 3H, H] kernel
    and gate/up into one [*, H, 2I] kernel so each layer issues one wide
    matmul instead of three/two (measured ~19% faster on the qkv matmul at
    prefill shapes on v5e). LoRA adapters must be merged first (lora.merge);
    packed params remain compatible with utils/quantize.quantize_tree (the
    int8 packed path goes through ops/pallas/int8_matmul).

    Deployment envelope: at 7B on a single 16G-HBM v5e chip the wide fused
    outputs push peak memory over HBM at serving batch sizes — packing is
    for smaller models or larger-HBM parts (v5p/v6e); the 7B/v5e-1 bench
    runs unpacked.

    MUTATES llm_params: the source kernels are donated to the concat (the
    7B tree otherwise transiently needs ~8GB extra HBM) and removed."""
    p = llm_params
    attn = p["layers"]["attn"]
    if all(k in attn for k in ("q_proj", "k_proj", "v_proj")):
        for name in ("q_proj", "k_proj", "v_proj"):
            if "lora_a" in attn[name]:
                raise ValueError("merge LoRA before pack_inference")
            if "scale" in attn[name] or "scale4" in attn[name]:
                raise ValueError("pack_inference must run BEFORE "
                                 "quantize_tree (per-channel scales can't "
                                 "be concatenated post hoc)")
        # [out, in] transposed kernels (possibly [L, out, in] stacked):
        # concat along the out axis; inputs donated -> freed immediately
        kq = attn.pop("q_proj")["kernel"]
        kk = attn.pop("k_proj")["kernel"]
        kv = attn.pop("v_proj")["kernel"]
        attn["qkv_proj"] = {"kernel": _packed_concat(kq, kk, kv,
                                                     kq.ndim - 2)}
    mlp = p["layers"].get("mlp")
    if mlp is not None and "gate_proj" in mlp:
        if "lora_a" in mlp["gate_proj"] or "lora_a" in mlp["up_proj"]:
            raise ValueError("merge LoRA before pack_inference")
        if any(s in mlp[n] for s in ("scale", "scale4")
               for n in ("gate_proj", "up_proj")):
            raise ValueError("pack_inference must run BEFORE quantize_tree")
        kg = mlp.pop("gate_proj")["kernel"]
        ku = mlp.pop("up_proj")["kernel"]
        mlp["gateup_proj"] = {"kernel": _packed_concat2(kg, ku,
                                                        kg.ndim - 1)}
    return p
