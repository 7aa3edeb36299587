"""MoE router introspection + expert-load visualization.

Rebuilds the reference's forward-hook gate capture (vqa_infer.py:151-165
`HookTool` on the `wg` linears) and vis_gate.py's text-vs-image expert-load
plots. No hooks needed here: a probe forward recomputes every layer's router
logits from the recorded hidden states — pure function, jit-able.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.config import LlamaConfig, MedplibConfig, MoeConfig
from medplib_tpu.models import llama as llama_lib
from medplib_tpu.models import medplib
from medplib_tpu.ops.norms import rms_norm


def capture_router_logits(params, cfg: MedplibConfig, batch,
                          rp_flag: bool = False) -> Dict[str, np.ndarray]:
    """Run the spliced forward and return per-layer router logits
    [L, B, T, E] plus the token-kind mask (image vs text slots)."""
    llm, lcfg, mcfg = params["llm"], cfg.llm, cfg.moe
    embeds, _, attn_mask, _, sm = medplib.splice_batch(
        params, cfg, batch, need_region=rp_flag)

    cos, sin = None, None
    from medplib_tpu.ops.rope import rope_cos_sin
    b, t, _ = embeds.shape
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cos, sin = rope_cos_sin(positions, lcfg.head_dim, lcfg.rope_theta)

    from medplib_tpu.models.moe_llama import make_moe_mlp_apply, _with_flags
    mlp_apply = make_moe_mlp_apply(lcfg, mcfg, train=False)
    p = _with_flags(llm, lcfg, mcfg)

    def body(x, layer_p):
        # capture the router input: post-attention-norm hidden state
        h = rms_norm(x, layer_p["input_layernorm"]["weight"],
                     lcfg.rms_norm_eps)
        from medplib_tpu.models.llama import _qkv
        from medplib_tpu.ops.attention import causal_attention
        q, k, v = _qkv(layer_p["attn"], h, lcfg, cos, sin)
        attn = causal_attention(q, k, v, attn_mask)
        from medplib_tpu.train.lora import linear as lora_linear
        x = x + lora_linear(layer_p["attn"]["o_proj"],
                            attn.reshape(b, t, -1))
        h2 = rms_norm(x, layer_p["post_attention_layernorm"]["weight"],
                      lcfg.rms_norm_eps)
        router_logits = h2.astype(jnp.float32) @ layer_p["moe"]["router"][
            "kernel"].astype(jnp.float32)
        y, _ = mlp_apply(layer_p, h2)
        return x + y, router_logits

    _, logits = jax.lax.scan(body, embeds, p["layers"])
    return {
        "router_logits": np.asarray(logits),          # [L, B, T, E]
        "is_image": np.asarray(sm.is_image),          # [B, T]
        "attn_mask": np.asarray(sm.attn_mask),        # [B, T]
    }


def expert_load(capture: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Per-layer expert selection fractions for text vs image tokens
    (vis_gate.py:10-120 analysis)."""
    logits = capture["router_logits"]           # [L, B, T, E]
    choice = logits.argmax(-1)                  # [L, B, T]
    L, B, T = choice.shape
    E = logits.shape[-1]
    valid = capture["attn_mask"] > 0
    is_img = capture["is_image"] & valid
    is_txt = (~capture["is_image"]) & valid

    def frac(sel_mask):
        out = np.zeros((L, E))
        for e in range(E):
            hit = (choice == e) & sel_mask[None]
            out[:, e] = hit.reshape(L, -1).sum(-1) / max(
                sel_mask.sum(), 1)
        return out

    return {"text": frac(is_txt), "image": frac(is_img)}


def plot_expert_load(load: Dict[str, np.ndarray], out_path: str):
    """Expert-load-per-layer figure (vis_gate.py output)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    L, E = load["text"].shape
    fig, axes = plt.subplots(1, 2, figsize=(12, 4), sharey=True)
    for ax, kind in zip(axes, ("text", "image")):
        for e in range(E):
            ax.plot(range(L), load[kind][:, e], marker="o",
                    label=f"expert {e}")
        ax.set_title(f"{kind} tokens")
        ax.set_xlabel("layer")
        ax.set_ylabel("selection fraction")
        ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
