#!/usr/bin/env bash
# Real-checkpoint parity harness (BASELINE.md north-star: Dice/BLEU parity
# with the reference on MeCoVQA).
#
# GATED: the released weights are not baked into this image, so this script
# checks for them and explains how to stage them; with weights present it
# runs the full chain:
#   1. translate the released HF/torch artifacts -> medplib_tpu orbax tree
#      (utils/export.py from-reference; schema-verified offline by
#      tests/test_hf_export.py round trips + the SAM reference-module
#      manifest test)
#   2. run the chunked eval driver on the MeCoVQA test split
#      (eval/cli.py, both seg + vqa modes)
#   3. print mDice / BLEU to compare against the reference's published
#      numbers (BASELINE.md; reference eval: model/eval/vqa_infer.py)
#
# Stage the artifacts (any mirror):
#   $WEIGHTS_DIR/medplib-7b-2e/        <- Huangxs/MedPLIB-7b-2e (merged HF)
#   $WEIGHTS_DIR/sam-med2d_b.pth       <- SAM-Med2D checkpoint
#   $WEIGHTS_DIR/clip-vit-large-patch14-336/
#   $DATA_DIR/MeCoVQA/Test/            <- MeCoVQA test jsons + images
set -euo pipefail

WEIGHTS_DIR=${WEIGHTS_DIR:-/data/weights}
DATA_DIR=${DATA_DIR:-/data/MeCoVQA}
OUT_DIR=${OUT_DIR:-./parity_out}
HF_DIR="$WEIGHTS_DIR/medplib-7b-2e"
SAM_PATH="$WEIGHTS_DIR/sam-med2d_b.pth"
CLIP_DIR="$WEIGHTS_DIR/clip-vit-large-patch14-336"

for p in "$HF_DIR" "$SAM_PATH" "$CLIP_DIR"; do
  if [ ! -e "$p" ]; then
    echo "parity_eval: missing $p"
    echo "Released weights are not in this image. Stage them as documented"
    echo "in the header of this script, then re-run. The translator schema"
    echo "itself is verified offline by tests/test_hf_export.py."
    exit 2
  fi
done

mkdir -p "$OUT_DIR"

if [ ! -d "$OUT_DIR/ckpt" ]; then
  python -m medplib_tpu.utils.export from-reference \
    --hf-dir "$HF_DIR" --sam-path "$SAM_PATH" --clip-dir "$CLIP_DIR" \
    --out-path "$OUT_DIR/ckpt"
fi

# pixel grounding (Dice) on MeCoVQA_Test_Grounding
python -m medplib_tpu.eval.cli \
  --version "$OUT_DIR/ckpt" --tokenizer "$HF_DIR" --moe-enable \
  --mode seg \
  --dataset-json "$DATA_DIR/Test/MeCoVQA_Test_Grounding.json" \
  --image-folder "$DATA_DIR/images" \
  --answers-file "$OUT_DIR/seg_results.jsonl" \
  --metrics-file "$OUT_DIR/seg_metrics.json" \
  --vis-mask --vis-save-path "$OUT_DIR/vis" | tee "$OUT_DIR/seg_metrics.txt"

# VQA (BLEU/F1) on MeCoVQA_Test_VQA
python -m medplib_tpu.eval.cli \
  --version "$OUT_DIR/ckpt" --tokenizer "$HF_DIR" --moe-enable \
  --mode vqa \
  --dataset-json "$DATA_DIR/Test/MeCoVQA_Test_VQA.json" \
  --image-folder "$DATA_DIR/images" \
  --answers-file "$OUT_DIR/vqa_results.jsonl" \
  --metrics-file "$OUT_DIR/vqa_metrics.json" | tee "$OUT_DIR/vqa_metrics.txt"

echo "Compare against BASELINE.md reference numbers (mDice / BLEU)."
