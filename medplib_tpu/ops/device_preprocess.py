"""Device-side fused serving preprocess: resize + pad + normalize as TWO
MXU MATMULS per image.

TPU-native counterpart of the host recipe in data/preprocess.py
(reference: /root/reference/datasets/LazySupervisedDataset.py:444-556 dual
SAM/CLIP pipeline; SURVEY.md build-plan step 2). The CPU path costs
~14 ms/image in the serving worker — a real share of per-request latency
next to the 34.7 ms CLIP encode — and runs on the single host core; this
moves it onto the chip and fuses it with the model's first device op.

Design (why this is NOT a gather kernel): PIL/cv2 bilinear resize is a
SEPARABLE triangle filter, i.e. `out = Wy @ img @ Wx^T` for banded weight
matrices — on TPU that is MXU work, and XLA fuses the channelwise
normalize and pad-mask into the surrounding elementwise ops. The weight
matrices are built INSIDE jit from traced (h, w) scalars:

  - the host pads the uint8 image into a fixed [bucket, bucket, 3] canvas
    (one memcpy) and ships true (h, w) alongside, so ONE compiled program
    serves every input size in a bucket — no per-aspect-ratio recompiles;
  - output row i of the fixed target canvas maps to resized-image row
    r = i - pad_top; its source coordinate is (r + .5) * (h / nh) - .5
    with triangle-filter support max(1, h / nh) (PIL's antialiased
    BILINEAR); rows outside [0, nh) get all-zero weights, which realizes
    the center-pad for free (SAM pads zeros after normalize; CLIP adds
    its int-truncated mean pad value through the same mask).

Numerics: PIL evaluates the same filter in 8.8 fixed point, so agreement
is ~1 LSB of uint8 (tests bound max |Δ| against the host path at 2/255
pre-normalize). The training loader keeps the exact host/C++ recipe; this
path is opt-in for serving (serve/worker.py device_preprocess=True).

MEASURED (run_all.py config 1, 1024px image, v5e-1 behind the axon
tunnel): 113.9 ms/image end-to-end vs 14.9 ms host — the uint8 canvas
H2D (3 MB) + dispatch round trips through the TUNNEL dominate, so the
worker defaults to the host path there. On a local PCIe-attached chip
the same transfer is ~1 ms and this path frees the host core; flip the
worker flag after measuring on that topology.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.data.preprocess import (CLIP_MEAN, CLIP_PAD_VALUE,
                                         CLIP_STD, SAM_PIXEL_MEAN,
                                         SAM_PIXEL_STD)


def _resize_weights(src: jnp.ndarray, dst: jnp.ndarray, n_src: int,
                    n_dst: int) -> jnp.ndarray:
    """[n_dst, n_src] separable triangle-filter weights resizing `src`
    valid pixels (of a padded axis of length n_src) onto the CENTERED
    `dst` span of a fixed n_dst axis. src/dst are traced scalars; rows
    outside the destination span are all zero (they become padding)."""
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    scale = src / jnp.maximum(dst, 1.0)            # source px per dest px
    support = jnp.maximum(scale, 1.0)              # antialias on downscale
    top = jnp.floor((n_dst - dst) / 2.0)           # center-pad offset

    i = jnp.arange(n_dst, dtype=jnp.float32)[:, None]   # dest canvas rows
    j = jnp.arange(n_src, dtype=jnp.float32)[None, :]   # source rows
    r = i - top                                         # row in resized img
    center = (r + 0.5) * scale - 0.5
    w = jnp.maximum(0.0, 1.0 - jnp.abs(j - center) / support)
    w = jnp.where((r >= -0.5) & (r < dst) & (j < src), w, 0.0)
    denom = jnp.sum(w, axis=1, keepdims=True)
    return w / jnp.maximum(denom, 1e-8)


def _resize_canvas(img: jnp.ndarray, h: jnp.ndarray, w: jnp.ndarray,
                   target: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """img [Hb, Wb, 3] f32 (valid pixels in the top-left [h, w] corner) ->
    ([target, target, 3] resized-longest-side + centered, [target, target]
    validity mask). Two dot_generals over the pixel grid — MXU work."""
    hb, wb = img.shape[:2]
    scale = target / jnp.maximum(h, w).astype(jnp.float32)
    nh = jnp.floor(h * scale + 0.5)
    nw = jnp.floor(w * scale + 0.5)
    wy = _resize_weights(h, nh, hb, target)            # [T, Hb]
    wx = _resize_weights(w, nw, wb, target)            # [T, Wb]
    out = jnp.einsum("ih,hwc,jw->ijc", wy, img, wx)
    valid = (jnp.sum(wy, axis=1) > 0.5)[:, None] & \
        (jnp.sum(wx, axis=1) > 0.5)[None, :]
    return out, valid


@functools.partial(jax.jit, static_argnames=("sam_size", "clip_size"))
def dual_preprocess_device(img_u8: jnp.ndarray, h: jnp.ndarray,
                           w: jnp.ndarray, sam_size: int = 256,
                           clip_size: int = 336):
    """One uint8 canvas [Hb, Wb, 3] (+ true h, w) -> the model-ready pair
      (sam [sam_size, sam_size, 3] f32, clip [clip_size, clip_size, 3] f32)
    fused on device: SAM normalizes then zero-pads; CLIP pads with the
    int-truncated pixel mean then rescales+normalizes — the exact recipe
    of data/preprocess.preprocess_sam/preprocess_clip."""
    img = img_u8.astype(jnp.float32)

    sam, sam_valid = _resize_canvas(img, h, w, sam_size)
    sam = (sam - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    sam = jnp.where(sam_valid[..., None], sam, 0.0)

    clip, clip_valid = _resize_canvas(img, h, w, clip_size)
    clip = jnp.where(clip_valid[..., None], clip,
                     CLIP_PAD_VALUE.astype(np.float32))
    clip = (clip / 255.0 - CLIP_MEAN) / CLIP_STD
    return sam, clip


def pick_bucket(h: int, w: int, buckets=(512, 1024, 2048)) -> int:
    for b in buckets:
        if h <= b and w <= b:
            return b
    return max(h, w)


def dual_preprocess(image_rgb: np.ndarray, sam_size: int = 256,
                    clip_size: int = 336):
    """Host entry: pad the uint8 image into its size bucket (one memcpy),
    run the fused device program, return (sam, clip, resize_hw) matching
    the host path's contract. One compile per bucket."""
    h, w = image_rgb.shape[:2]
    b = pick_bucket(h, w)
    canvas = np.zeros((b, b, 3), np.uint8)
    canvas[:h, :w] = image_rgb
    sam, clip = dual_preprocess_device(
        jnp.asarray(canvas), jnp.asarray(h, jnp.int32),
        jnp.asarray(w, jnp.int32), sam_size, clip_size)
    scale = sam_size / max(h, w)
    resize_hw = (int(h * scale + 0.5), int(w * scale + 0.5))
    return sam, clip, resize_hw
