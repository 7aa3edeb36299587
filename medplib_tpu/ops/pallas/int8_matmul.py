"""Weight-only int8 matmul as a Pallas TPU kernel.

y = x @ dequant(w) with w stored int8 + per-output-channel scales
(utils/quantize.py layout). XLA fuses the dequant into narrow matmuls, but
for the WIDE packed kernels (models/llama.py pack_inference: qkv [3H, H],
gateup [H, 2I]) it materializes a full bf16 copy of the dequantized weight
in HBM — 3-6 GB of traffic per forward at 7B, an OOM at batch 12. This
kernel streams the int8 blocks through VMEM and dequantizes in-register, so
HBM only ever sees int8 weight bytes.

Used by models/llama.py's packed branches (pack_inference trees); plain
(unpacked) int8 linears stay on the XLA path, which is already at roofline
for them. At 7B on a 16G-HBM v5e the packed+int8 combination still exceeds
HBM at batch >= 8 (the wide [T, 3H]/[T, 2I] outputs materialize at the
kernel boundary instead of fusing into consumers) — packing is for bf16
serving there; this kernel pays off on larger-HBM parts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, s_ref, o_ref, *, transposed: bool):
    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)
    scale = s_ref[...].astype(jnp.float32)
    if transposed:  # w block [bn, K], scale [bn, 1]
        acc = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * scale.reshape(1, -1)
    else:  # w block [K, bn], scale [1, bn]
        acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
        acc = acc * scale
    o_ref[...] = acc.astype(o_ref.dtype)


def _matmul(x2d: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
            transposed: bool, block_m: int = 256,
            block_n: int = 512) -> jnp.ndarray:
    # block VMEM budget (double-buffered): x 2*bm*K*2B + w 2*K*bn*1B
    # + out/acc ~ bm*bn*6B; (256, 512) at K=4096 is ~9.5MB of the 16MB limit
    """x2d [M, K] @ dequant(w) -> [M, N]. w: [K, N] (or [N, K] transposed,
    scale [N, 1] instead of [1, N])."""
    m, k = x2d.shape
    n = w.shape[0] if transposed else w.shape[1]
    bm = min(block_m, max(8, m))
    bn = min(block_n, n)
    # VMEM budget (double-buffered pipeline): x 2*bm*k*2B, w 2*k*bn*1B,
    # out/acc bm*bn*6B — shrink blocks until it fits (K=11008 mlp kernels
    # blow the (256, 512) default that was sized for K=4096)
    def vmem(bm_, bn_):
        return 2 * bm_ * k * 2 + 2 * k * bn_ + bm_ * bn_ * 6
    BUDGET = 12 * 1024 * 1024
    while vmem(bm, bn) > BUDGET and bm > 64:
        bm //= 2
    while vmem(bm, bn) > BUDGET and bn > 128:
        bn //= 2

    m_pad = -m % bm
    if m_pad:
        x2d = jnp.pad(x2d, ((0, m_pad), (0, 0)))
    mp = m + m_pad
    n_pad = -n % bn
    if n_pad:  # pad output channels like rows (zero scale -> zero output)
        if transposed:
            w = jnp.pad(w, ((0, n_pad), (0, 0)))
            scale = jnp.pad(scale, ((0, n_pad), (0, 0)))
        else:
            w = jnp.pad(w, ((0, 0), (0, n_pad)))
            scale = jnp.pad(scale, ((0, 0), (0, n_pad)))
    np_ = n + n_pad

    if transposed:
        w_spec = pl.BlockSpec((bn, k), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((bn, 1), lambda i, j: (j, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((k, bn), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)
        s_spec = pl.BlockSpec((1, bn), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, transposed=transposed),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            s_spec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x2d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=x2d.size * x2d.dtype.itemsize + w.size + n * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x2d, w, scale)
    return out[:m, :n]


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray,
                scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant(w_q [K, N], scale [1, N]) -> [..., N]."""
    lead = x.shape[:-1]
    y = _matmul(x.reshape(-1, x.shape[-1]), w_q, scale, transposed=False)
    return y.reshape(lead + (y.shape[-1],))


def int8_matmul_t(x: jnp.ndarray, w_q: jnp.ndarray,
                  scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ dequant(w_q [N, K], scale [N, 1]).T -> [..., N]
    (the transposed 'decode-major' kernel storage)."""
    lead = x.shape[:-1]
    y = _matmul(x.reshape(-1, x.shape[-1]), w_q, scale, transposed=True)
    return y.reshape(lead + (y.shape[-1],))
