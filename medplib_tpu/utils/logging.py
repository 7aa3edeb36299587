"""Metrics + logging: AverageMeter/ProgressMeter and a TensorBoard-or-JSONL
scalar writer.

Rebuilds /root/reference/utils/utils.py:28-126 (meters with cross-rank
all_reduce -> here a jnp psum happens inside the jit'd step; meters only see
host scalars) and the trainer's TensorBoard scalars
(train_ds_medplib.py:649-691).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __str__(self):
        return ("{name} {val" + self.fmt + "} ({avg" + self.fmt + "})").format(
            name=self.name, val=self.val, avg=self.avg)


class ProgressMeter:
    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.fmtstr = "{:" + str(len(str(num_batches))) + "d}/" + str(
            num_batches)
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        print("  ".join(entries), flush=True)


class ScalarWriter:
    """TensorBoard writer when available, JSONL fallback otherwise."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": step,
                 "ts": time.time()}) + "\n")
            self._jsonl.flush()

    def add_scalars(self, scalars: Dict[str, float], step: int,
                    prefix: str = ""):
        for k, v in scalars.items():
            self.add_scalar(prefix + k, v, step)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        else:
            self._jsonl.close()
