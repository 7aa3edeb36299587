#!/bin/bash
# Stage 4: MoE fusion SFT (reference train_stage4.sh: bs4 x ga8, ctx 1024,
# 2 experts top-1 capacity 1.5, experts seeded from stage3 + stage2)
python -m medplib_tpu.train.cli \
  --version "${BASE_CKPT:?}" --tokenizer "${TOKENIZER:?}" \
  --dataset-json "${TRAIN_JSON:?}" --image-folder "${IMAGE_FOLDER:?}" \
  --exp-name stage4 --lr 2e-5 --epochs 1 --batch-size 4 \
  --grad-accumulation-steps 8 --model-max-length 1024 \
  --moe-enable --num-experts 2 --top-k-experts 1 --capacity-factor 1.5 \
  --expert-pretrained-path "${EXPERTS:?stage3_dir,stage2_dir}" \
  --mesh-data "${MESH_DATA:-1}" --mesh-expert "${MESH_EXPERT:-1}" "$@"
