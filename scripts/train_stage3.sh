#!/bin/bash
# Stage 3: segmentation SFT (reference train_stage3.sh: bs32, lr 3e-4,
# 10 epochs, LoRA r8 on MLP, dice 5.0, sam 256)
python -m medplib_tpu.train.cli \
  --version "${BASE_CKPT:?}" --tokenizer "${TOKENIZER:?}" \
  --dataset-json "${TRAIN_JSON:?}" --image-folder "${IMAGE_FOLDER:?}" \
  --exp-name stage3 --lr 3e-4 --epochs 10 --batch-size 32 \
  --model-max-length 2048 --dice-loss-weight 5.0 \
  --lora-r 8 --lora-target-modules gate_proj,up_proj,down_proj \
  --mesh-data "${MESH_DATA:-1}" "$@"
