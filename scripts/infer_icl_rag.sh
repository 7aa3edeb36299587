#!/bin/bash
# RAG-augment the test set, then run ICL inference
# (reference scripts/infer_medplib_icl_rag.sh -> infer_medplib_icl.sh)
set -e
python -m medplib_tpu.rag.image_rag augment \
  --test-json "${TEST_JSON:?}" --index-dir "${INDEX_DIR:?}" \
  --out-json "${TEST_JSON%.json}_rag.json" --top-k "${TOP_K:-1}" \
  --image-folder "${IMAGE_FOLDER:-}" --clip-checkpoint "${CLIP_CKPT:?}"
python -m medplib_tpu.eval.cli \
  --version "${CKPT:?}" --tokenizer "${TOKENIZER:?}" \
  --dataset-json "${TEST_JSON%.json}_rag.json" \
  --image-folder "${IMAGE_FOLDER:?}" --mode seg \
  --model-max-length "${MAX_LEN:-4096}" "$@"
