"""Optimizer: AdamW + warmup-decay schedule + grad clipping + trainable-mask.

Replaces the reference's inline DeepSpeed config
(/root/reference/train_ds_medplib.py:383-430): AdamW, WarmupDecayLR (linear
warmup -> linear decay to 0), grad-clip 1.0. ZeRO-2's optimizer-state
sharding falls out of GSPMD: optax state mirrors the param pytree, so
applying the same NamedShardings shards moments along the mesh for free.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from medplib_tpu.config import TrainConfig


def warmup_decay_schedule(cfg: TrainConfig) -> optax.Schedule:
    """DeepSpeed WarmupDecayLR: 0 -> lr over warmup_steps, then linear decay
    to min_lr_ratio*lr at total_steps."""
    return optax.join_schedules([
        optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps),
        optax.linear_schedule(cfg.lr, cfg.lr * cfg.min_lr_ratio,
                              max(cfg.total_steps - cfg.warmup_steps, 1)),
    ], [cfg.warmup_steps])


def make_optimizer(cfg: TrainConfig, trainable_mask: Any = None):
    """optax chain; frozen leaves get zero updates via the mask."""
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adamw(
            learning_rate=warmup_decay_schedule(cfg),
            b1=cfg.beta1, b2=cfg.beta2, eps=1e-8,
            weight_decay=cfg.weight_decay),
    )
    if trainable_mask is not None:
        # optax.masked (not multi_transform): masked-out leaves get NO
        # optimizer state at all — for the QLoRA config (frozen int8 7B
        # base + bf16 LoRA, train/trainer.py) multi_transform would still
        # allocate adam moments for the whole frozen tree. The train step
        # feeds scalar-zero placeholder grads at frozen positions, which
        # masked passes through unchanged and apply_updates adds as 0.
        tx = optax.masked(tx, trainable_mask)
    return tx
