#!/bin/bash
# MedPLIB-ICL training stage (reference scripts/train_medplib_icl.sh):
# MoE base + in-context (image, mask) example pairs; token compression is
# always on, the separate mask mode adds the 64-token mask encoder; the
# compressor/mask-encoder join the sft module list.
set -e
ICL_MASK_MODE="${ICL_MASK_MODE:-overlay}"
ICL_EXTRA_ARGS="--mm-token-compress --mm-compressed-token-count 256"
SFT_MODULES="mask_decoder,text_hidden_fcs,mm_token_compressor"
if [ "$ICL_MASK_MODE" = "separate" ]; then
  ICL_EXTRA_ARGS="$ICL_EXTRA_ARGS --icl-mask-encoder --mask-encoder-token-count 64"
  SFT_MODULES="$SFT_MODULES,mask_encoder"
fi
python -m medplib_tpu.train.cli \
  --icl-enable --icl-mask-mode "$ICL_MASK_MODE" $ICL_EXTRA_ARGS \
  --version "${CKPT:?}" --tokenizer "${TOKENIZER:?}" \
  --vision-pretrained "${SAM_CKPT:-}" --clip-dir "${CLIP_DIR:-}" \
  --dataset-json "${TRAIN_JSON:?}" --val-data-path "${VAL_JSON:-}" \
  --image-folder "${IMAGE_FOLDER:?}" \
  --moe-enable --num-experts 2 --top-k-experts 1 \
  --exp-name "${EXP_NAME:-medplib-icl}" \
  --epochs "${EPOCHS:-10}" --batch-size "${BS:-4}" \
  --model-max-length "${MAX_LEN:-4096}" \
  --grad-accumulation-steps 1 \
  --ce-loss-weight 1.0 --dice-loss-weight 5.0 --bce-loss-weight 1.0 \
  --iou-loss-weight 0 --focal-loss-weight 1.0 \
  --lora-r 8 --lora-alpha 16 \
  --lora-target-modules "gate_proj,up_proj,down_proj" \
  --sft-modules "$SFT_MODULES" \
  --lr 0.0003 --save-steps 300 "$@"
