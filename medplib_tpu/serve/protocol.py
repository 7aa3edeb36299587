"""Serving wire protocol.

Same HTTP surface and payloads as the reference serving stack
(/root/reference/model/serve/): JSON bodies, streamed chunks separated by
NUL bytes, masks shipped as sparse nonzero coordinates
(model_worker.py:522-540), base64 images in requests
(gradio_web_server.py:435-446). Implemented over stdlib http.server —
FastAPI isn't in this image, and the protocol needs nothing beyond JSON+HTTP.
"""

from __future__ import annotations

import base64
import io
import json
from typing import Dict, List, Tuple

import numpy as np

HEARTBEAT_WORKER_INTERVAL = 15   # constants.py:1-2
HEARTBEAT_EXPIRATION = 30
STREAM_DELIMITER = b"\0"

ERROR_CODE_OK = 0
ERROR_CODE_OVERLOAD = 1
ERROR_CODE_ERROR = 2


def encode_sparse_mask(mask: np.ndarray) -> Tuple[List[List[int]], int, int]:
    """Binary mask -> (nonzero [y, x] coords, height, width)."""
    h, w = mask.shape
    coords = np.transpose(np.nonzero(mask)).tolist()
    return coords, h, w


def decode_sparse_mask(coords: List[List[int]], height: int,
                       width: int) -> np.ndarray:
    mask = np.zeros((height, width), np.uint8)
    if coords:
        arr = np.asarray(coords, np.int64)
        mask[arr[:, 0], arr[:, 1]] = 1
    return mask


def encode_image_b64(image_rgb: np.ndarray) -> str:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(image_rgb.astype(np.uint8)).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def decode_image_b64(data: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(base64.b64decode(data)))
                      .convert("RGB"))


def stream_chunks(raw: bytes):
    """Split a NUL-delimited response body into JSON chunks."""
    for part in raw.split(STREAM_DELIMITER):
        if part:
            yield json.loads(part)
