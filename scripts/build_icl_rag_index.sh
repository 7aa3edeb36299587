#!/bin/bash
# Build the image-RAG index over ICL candidates
# (reference scripts/build_medplib_icl_rag_index.sh)
python -m medplib_tpu.rag.image_rag build \
  --candidates "${CANDIDATES:?}" --image-folder "${IMAGE_FOLDER:-}" \
  --out-dir "${INDEX_DIR:?}" --clip-checkpoint "${CLIP_CKPT:?}"
