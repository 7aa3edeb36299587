#!/bin/bash
# RAG-augment the test set, then run ICL inference with the ICL dataset
# (reference scripts/infer_medplib_icl_rag.sh -> infer_medplib_icl.sh;
# the eval CLI consumes the injected icl_examples via --icl-enable, the
# vqa_infer.py:62-64,288 dataset switch)
set -e
python -m medplib_tpu.rag.image_rag augment \
  --test-json "${TEST_JSON:?}" --index-dir "${INDEX_DIR:?}" \
  --out-json "${TEST_JSON%.json}_rag.json" --top-k "${TOP_K:-1}" \
  --image-folder "${IMAGE_FOLDER:-}" --clip-checkpoint "${CLIP_CKPT:?}"
ICL_ARGS="--icl-enable --icl-mask-mode ${ICL_MASK_MODE:-overlay}"
if [ "${MM_TOKEN_COMPRESS:-0}" = "1" ]; then
  ICL_ARGS="$ICL_ARGS --mm-token-compress"
fi
if [ "${ICL_MASK_MODE:-overlay}" = "separate" ] && \
   [ "${ICL_MASK_ENCODER:-0}" = "1" ]; then
  ICL_ARGS="$ICL_ARGS --icl-mask-encoder"
fi
python -m medplib_tpu.eval.cli \
  --version "${CKPT:?}" --tokenizer "${TOKENIZER:?}" \
  --dataset-json "${TEST_JSON%.json}_rag.json" \
  --image-folder "${IMAGE_FOLDER:?}" --mode seg \
  --model-max-length "${MAX_LEN:-4096}" $ICL_ARGS "$@"
