#!/bin/bash
# Stage 2: VQA + region SFT with LoRA (reference scripts/train_stage2.sh:
# 4 GPUs x bs16 x ga2, lr 1e-4, 3 epochs, bf16, ctx 2048 -> one TPU host,
# DP over the mesh data axis)
python -m medplib_tpu.train.cli \
  --version "${BASE_CKPT:?path to llava-v1.5-7b export}" \
  --tokenizer "${TOKENIZER:?}" \
  --dataset-json "${TRAIN_JSON:?}" --image-folder "${IMAGE_FOLDER:?}" \
  --exp-name stage2 --lr 1e-4 --epochs 3 --batch-size 16 \
  --grad-accumulation-steps 2 --model-max-length 2048 \
  --no-seg --region-fea-adapter \
  --lora-r 8 --lora-target-modules q_proj,v_proj \
  --mesh-data "${MESH_DATA:-1}" "$@"
