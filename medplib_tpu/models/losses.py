"""Training losses (CE + mask BCE/Dice/IoU/Focal).

Rebuilds the loss stack of /root/reference/model/MedPLIB.py:26-124, 515-572
with masked, batched reductions instead of per-row Python loops. All loss
math in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from medplib_tpu.config import IGNORE_INDEX


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Shifted next-token CE, mean over non-ignored targets (HF semantics:
    medplib_llama.py:119-148 incl. all-ignored rows contributing nothing)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe = jnp.maximum(shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def sigmoid_ce_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean over masks of per-mask pixel-mean BCE-with-logits
    (MedPLIB.py:109-124 + the per-row weighting at 515-540 collapses to
    exactly this). pred/target: [N, H, W]; valid: [N] bool."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    per_pix = jnp.maximum(p, 0) - p * t + jnp.log1p(jnp.exp(-jnp.abs(p)))
    per_mask = per_pix.reshape(per_pix.shape[0], -1).mean(-1)
    return _masked_mean(per_mask, valid)


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray,
              valid: Optional[jnp.ndarray] = None, eps: float = 1e-6):
    """1 - dice score per mask, mean over masks (MedPLIB.py:71-106)."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32)).reshape(pred.shape[0], -1)
    t = target.astype(jnp.float32).reshape(target.shape[0], -1)
    inter = jnp.sum(p * t, -1)
    union = jnp.sum(p, -1) + jnp.sum(t, -1)
    per_mask = 1.0 - (2.0 * inter + eps) / (union + eps)
    return _masked_mean(per_mask, valid)


def mask_iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
                  pred_iou: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None):
    """(soft IoU - predicted IoU)^2 per mask (MedPLIB.py:26-44; computed
    per-mask here — the reference pools a row's masks into one IoU)."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32)).reshape(pred.shape[0], -1)
    t = target.astype(jnp.float32).reshape(target.shape[0], -1)
    inter = jnp.sum(p * t, -1)
    union = jnp.sum(p, -1) + jnp.sum(t, -1) - inter
    iou = (inter + 1e-7) / (union + 1e-7)
    per_mask = (iou - pred_iou.reshape(-1).astype(jnp.float32)) ** 2
    return _masked_mean(per_mask, valid)


def focal_loss(pred: jnp.ndarray, target: jnp.ndarray,
               valid: Optional[jnp.ndarray] = None,
               gamma: float = 2.0, alpha: float = 0.25):
    """Sigmoid focal loss, normalized by pixel count per mask
    (MedPLIB.py:46-69; per-mask here, see mask_iou_loss note)."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    t = target.astype(jnp.float32)
    loss_pos = -alpha * t * (1 - p) ** gamma * jnp.log(p + 1e-12)
    loss_neg = -(1 - alpha) * (1 - t) * p ** gamma * jnp.log(1 - p + 1e-12)
    per_mask = (loss_pos + loss_neg).reshape(pred.shape[0], -1).mean(-1)
    return _masked_mean(per_mask, valid)


def _masked_mean(per_mask: jnp.ndarray, valid: Optional[jnp.ndarray]):
    if valid is None:
        return per_mask.mean()
    v = valid.astype(jnp.float32)
    return jnp.sum(per_mask * v) / (jnp.sum(v) + 1e-8)
