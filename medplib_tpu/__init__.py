"""medplib_tpu — a TPU-native medical multimodal LLM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MedPLIB
(ShawnHuang497/MedPLIB): image-level VQA, region-level VQA, pixel grounding
(<SEG> -> SAM-Med2D mask decode), mixture-of-experts LLaMA backbone, and the
ICL (in-context segmentation) extension — designed TPU-first:

- single `(data, expert, model)` device mesh; GSPMD/pjit sharding everywhere
  (replaces DeepSpeed ZeRO-2 + NCCL in the reference,
  /root/reference/train_ds_medplib.py:383-420)
- batched XLA ops where the reference runs Python loops (multimodal splice,
  per-image SAM encoder loop, per-SEG-token decode loop; see SURVEY.md §3)
- Pallas TPU kernels for the hot paths (flash attention, MoE dispatch,
  fused image preprocessing)

Package layout:
  config     typed configs mirroring the reference argparse surface
  parallel   mesh construction, sharding rules, collectives
  ops        pure-function numeric ops + Pallas kernels
  models     llama / moe / clip / sam_med2d / projector / composite medplib
  data       conversation templates, tokenization, datasets, collator
  train      optimizer, LoRA, train step, checkpointing
  eval       VQA + segmentation metrics, inference drivers
  serve      controller / worker HTTP serving
  rag        image-RAG index build + retrieval
"""

__version__ = "0.1.0"
