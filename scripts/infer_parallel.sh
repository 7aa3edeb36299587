#!/bin/bash
# Chunked parallel eval fan-out + jsonl concat
# (reference model/eval/infer_parallel_medplib.sh:60-93). Each chunk is one
# host process; on a TPU pod slice launch one per host.
set -e
NUM_CHUNKS="${NUM_CHUNKS:-4}"
OUT="${OUT:-answers}"
mkdir -p "$OUT"
pids=()
for IDX in $(seq 0 $((NUM_CHUNKS-1))); do
  python -m medplib_tpu.eval.cli \
    --version "${CKPT:?}" --tokenizer "${TOKENIZER:?}" \
    --dataset-json "${TEST_JSON:?}" --image-folder "${IMAGE_FOLDER:?}" \
    --mode "${MODE:-seg}" --num-chunks "$NUM_CHUNKS" --chunk-idx "$IDX" \
    --answers-file "$OUT/chunk${IDX}.jsonl" "$@" &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p"; done
cat "$OUT"/chunk*.jsonl > "$OUT/merged.jsonl"
echo "merged -> $OUT/merged.jsonl"
