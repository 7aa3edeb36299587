"""Interactive chat CLI with pixel grounding.

Rebuild of /root/reference/chat.py: REPL over a conversation template, dual
SAM/CLIP image preprocessing (175-207), jit generation + <SEG>-driven mask
decode (211-219), prediction-mask and overlay JPEGs saved per turn
(226-249). Precision/quantization flags map to param dtype casting instead
of bitsandbytes.

Usage:
  python -m medplib_tpu.chat --checkpoint <orbax params dir> \
      --tokenizer <hf tokenizer dir> [--moe] [--precision bf16]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_argparser():
    ap = argparse.ArgumentParser(description="MedPLIB-TPU chat")
    ap.add_argument("--checkpoint", required=True,
                    help="orbax params directory (export of utils/export.py)")
    ap.add_argument("--tokenizer", required=True,
                    help="HF tokenizer path (llava-v1.5 vocab + extra tokens)")
    ap.add_argument("--conv-type", default="v1",
                    choices=["v1", "llava_v1", "llava_llama_2"])
    ap.add_argument("--precision", default="bf16",
                    choices=["bf16", "fp32"])
    ap.add_argument("--load-in-8bit", action="store_true",
                    help="weight-only int8 (chat.py:103-112 analog; "
                         "visual modules skipped like llm_int8_skip_modules)")
    ap.add_argument("--load-in-4bit", action="store_true",
                    help="weight-only int4, blockwise nibble-packed "
                         "(chat.py:89-102 / bnb nf4 analog)")
    ap.add_argument("--moe", action="store_true",
                    help="MoE checkpoint (MedPLIB-7b-2e layout)")
    ap.add_argument("--vis-save-path", default="./vis_output")
    ap.add_argument("--max-new-tokens", type=int, default=512)
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="sampling temperature; < 1e-4 = greedy "
                         "(model_worker.py:420-425 semantics)")
    ap.add_argument("--top-p", type=float, default=1.0,
                    help="nucleus sampling mass (applies when sampling)")
    ap.add_argument("--seed", type=int, default=0, help="sampling RNG seed")
    ap.add_argument("--sam-img-size", type=int, default=256)
    # debug (the reference's --cpu_only analog)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model config for CPU smoke/debug; "
                         "--checkpoint random initializes random params")
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from medplib_tpu.config import (MedplibConfig, MoeConfig)
    from medplib_tpu.data import preprocess as pp
    from medplib_tpu.data import tokenize as tk
    from medplib_tpu.data.conversation import conv_templates
    from medplib_tpu.data.dataset import CollatorConfig, collate, to_model_batch
    from medplib_tpu.eval.seg_metrics import binarize_logits
    from medplib_tpu.models import medplib
    from medplib_tpu.utils.checkpoint import load_params
    from medplib_tpu.utils.hf_weights import cast_tree

    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    tk.add_special_tokens(tokenizer)
    seg_idx = tokenizer.convert_tokens_to_ids("<SEG>")

    moe_cfg = MoeConfig(enable=args.moe, num_experts=2, top_k=1,
                        capacity_factor=1.5, eval_capacity_factor=2.0,
                        moe_mode="dense")
    if args.tiny:
        from medplib_tpu.config import tiny_cli_config
        cfg = tiny_cli_config(moe_cfg, seg_idx, len(tokenizer))
    else:
        cfg = MedplibConfig(moe=moe_cfg, seg_token_idx=seg_idx,
                            vocab_size_padded=len(tokenizer))
    if args.checkpoint == "random":
        params = medplib.init_medplib(jax.random.PRNGKey(0), cfg)
    else:
        params = load_params(args.checkpoint)
    if args.precision == "bf16":
        params = cast_tree(params, jnp.bfloat16)
    if args.load_in_4bit or args.load_in_8bit:
        from medplib_tpu.utils.quantize import quantize_tree
        params = quantize_tree(params, bits=4 if args.load_in_4bit else 8)

    cc = CollatorConfig(max_seq_len=512,
                        image_tokens=medplib.image_tokens_per_image(cfg),
                        sam_image_size=cfg.sam.image_size,
                        clip_image_size=cfg.vision.image_size)
    do_sample = args.temperature >= 1e-4  # model_worker.py:420-425
    gen = jax.jit(lambda p, b, k: medplib.generate(
        p, cfg, b, max_new_tokens=args.max_new_tokens,
        eos_id=tokenizer.eos_token_id or 2, unroll_layers=not args.tiny,
        do_sample=do_sample, temperature=args.temperature,
        top_p=args.top_p, rng=k))
    rng = jax.random.PRNGKey(args.seed)

    os.makedirs(args.vis_save_path, exist_ok=True)
    conv_template = conv_templates[args.conv_type]
    turn = 0
    while True:
        conv = conv_template.copy()
        try:
            prompt = input("Please input your prompt: ")
        except EOFError:
            break
        if not prompt:
            continue
        image_path = input("Please input the image path: ")
        if not os.path.exists(image_path):
            print(f"File not found: {image_path}")
            continue

        conv.append_message(conv.roles[0], "<image>\n" + prompt)
        conv.append_message(conv.roles[1], None)
        full_prompt = conv.get_prompt()

        rgb = pp.load_image_rgb(image_path)
        image_sam, resize_hw = pp.preprocess_sam(rgb, cfg.sam.image_size)
        sample = {
            "input_ids": np.asarray(
                tk.tokenizer_image_token(full_prompt, tokenizer), np.int64),
            "labels": np.full(1, -100, np.int64),
            "image_clip": pp.preprocess_clip(rgb, cfg.vision.image_size),
            "image_sam": image_sam, "resize_hw": resize_hw,
            "original_hw": rgb.shape[:2], "gt_masks": [],
            "gt_masks_original": [], "question": [prompt], "gt": [""],
            "image_path": image_path, "answer_type": None,
        }
        sample["labels"] = np.full(len(sample["input_ids"]), -100, np.int64)
        arrays, meta = collate([sample], cc)
        rng, turn_key = jax.random.split(rng)
        res = gen(params, to_model_batch(arrays), turn_key)
        n = int(np.asarray(res.num_generated)[0])
        toks = [int(t) for t in np.asarray(res.output_ids)[0][:n] if t > 0]
        text = tokenizer.decode(toks, skip_special_tokens=False).replace(
            "</s>", "").strip()
        print("ASSISTANT:", text)

        if bool(np.asarray(res.has_seg)[0]):
            logits = np.asarray(res.pred_masks)[0, 0]
            pred = pp.unpad_and_resize_mask(logits, resize_hw, rgb.shape[:2])
            mask = binarize_logits(pred)
            from PIL import Image
            base = os.path.splitext(os.path.basename(image_path))[0]
            mask_path = os.path.join(args.vis_save_path,
                                     f"{base}_{turn}_mask.jpg")
            Image.fromarray((mask * 255).astype(np.uint8)).save(mask_path)
            overlay = rgb.copy()
            overlay[mask > 0] = (0.5 * overlay[mask > 0] +
                                 0.5 * np.array([255, 0, 0])).astype(np.uint8)
            ov_path = os.path.join(args.vis_save_path,
                                   f"{base}_{turn}_masked.jpg")
            Image.fromarray(overlay).save(ov_path)
            print(f"{mask_path} saved.")
            print(f"{ov_path} saved.")
        turn += 1


if __name__ == "__main__":
    main()
