"""Profiling / tracing helpers.

The reference's only instrumentation is wall-clock meters
(SURVEY.md §5 "Tracing/profiling"); here the TPU-native equivalents:
- `trace(logdir)`: jax.profiler device trace (TensorBoard-compatible)
- `annotate(name)`: TraceAnnotation shown in the trace timeline
- `timed(fn)`: host-side wall-clock with a REAL device sync — on the axon
  tunnel `block_until_ready` does not synchronize, so this forces a tiny
  host fetch (see .claude/skills/verify/SKILL.md gotchas)
- `flops_estimate`: analytic per-step FLOP estimate for MFU reporting
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_sync(tree: Any) -> float:
    """Force completion of `tree`'s computation; returns a checksum so the
    fetch cannot be elided."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timed(fn: Callable, *args, iters: int = 5, warmup: int = 1, **kwargs):
    """-> (seconds_per_iter, last_result). Honest device timing."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        device_sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kwargs)
        device_sync(out)
    return (time.time() - t0) / iters, out


def llama_flops_per_token(hidden: int, layers: int, intermediate: int,
                          vocab: int, seq: int) -> float:
    """Analytic forward FLOPs/token (2*params matmul + attention)."""
    attn = 4 * hidden * hidden + 2 * 2 * seq * hidden  # proj + scores/values
    mlp = 3 * hidden * intermediate
    head = hidden * vocab
    return 2.0 * (layers * (attn + mlp) + head)


def mfu(tokens_per_sec: float, flops_per_token: float,
        peak_flops: float = 197e12) -> float:
    """Model FLOPs utilization vs v5e bf16 peak (197 TFLOP/s)."""
    return tokens_per_sec * flops_per_token / peak_flops
