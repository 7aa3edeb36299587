"""Device mesh + GSPMD sharding rules.

TPU-native replacement for the reference's DeepSpeed ZeRO-2 / NCCL runtime
(/root/reference/train_ds_medplib.py:383-420, SURVEY.md §2.4):

- data  axis: batch-parallel; gradients reduce over it (ZeRO-2's
  reduce-scatter becomes GSPMD-sharded optimizer state along `data`)
- expert axis: MoE expert parallelism; DeepSpeed's NCCL all-to-all token
  dispatch becomes `lax.all_to_all`/GSPMD resharding over this axis
- model  axis: tensor parallelism (vestigial in the reference,
  medplib_moe_llama.py:382-386; first-class here)

Parameter shardings are expressed as *logical axis names* on each weight,
mapped to mesh axes by RULES — the standard GSPMD recipe: pick a mesh,
annotate, let XLA insert collectives.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medplib_tpu.config import MeshConfig

AXIS_DATA = "data"
AXIS_EXPERT = "expert"
AXIS_MODEL = "model"
AXIS_NAMES = (AXIS_DATA, AXIS_EXPERT, AXIS_MODEL)


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence[Any]] = None) -> Mesh:
    """Build a (data, expert, model) mesh.

    Axis ordering puts `model` innermost so tensor-parallel collectives ride
    the fastest ICI links, then `expert`, then `data` outermost (cross-slice
    DCN traffic, if any, is data-parallel gradient reduction only).
    """
    if devices is None:
        devices = jax.devices()
    n = cfg.total
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(cfg.data, cfg.expert, cfg.model)
    return Mesh(arr, AXIS_NAMES)


def local_mesh() -> Mesh:
    """1-device mesh (single-chip dev / bench path)."""
    return make_mesh(MeshConfig(1, 1, 1))


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Multihost entry: join the JAX distributed runtime BEFORE any backend
    touch. After this, jax.devices() is the GLOBAL device list and
    make_mesh() spans hosts — the data axis should be laid out so per-host
    device groups are contiguous (our (data, expert, model) reshape does
    this when data is the outermost/multi-host axis), keeping expert/model
    collectives on intra-host ICI and only data-parallel gradient reduction
    on DCN. Replaces the reference's torch.distributed/DeepSpeed launcher
    env handshake (train_ds_medplib.py:383-420, local_rank/world_size).
    """
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def host_local_batch_to_global(mesh: Mesh, batch: Any) -> Any:
    """Multihost data loading: each process loads only ITS slice of the
    global batch (1/num_processes of the data axis); this assembles the
    per-host numpy shards into global jax.Arrays sharded along `data`
    without any cross-host transfer. Single-process: equivalent to
    device_put with the batch sharding."""
    import jax

    def conv(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(AXIS_DATA)), x)

    return jax.tree_util.tree_map(conv, batch)


# ---------------------------------------------------------------------------
# Logical-axis -> mesh-axis rules
# ---------------------------------------------------------------------------

# Logical axis vocabulary used by model init code:
#   batch      -> data
#   embed      -> None (replicated hidden dim)
#   vocab      -> model (embedding/lm_head output dim sharded over TP)
#   heads      -> model (attention head dim)
#   mlp        -> model (FFN intermediate dim)
#   expert     -> expert (leading expert dim of MoE stacks)
#   conv/spatial/null -> replicated
RULES: Dict[str, Optional[str]] = {
    "batch": AXIS_DATA,
    "vocab": AXIS_MODEL,
    "heads": AXIS_MODEL,
    "kv_heads": AXIS_MODEL,
    "mlp": AXIS_MODEL,
    "expert": AXIS_EXPERT,
    "embed": None,
    "head_dim": None,
    "conv": None,
    "spatial": None,
    None: None,
}


def logical_to_spec(logical_axes: Sequence[Optional[str]]) -> P:
    return P(*[RULES.get(a, None) for a in logical_axes])


def logical_to_sharding(mesh: Mesh, logical_axes) -> NamedSharding:
    return NamedSharding(mesh, logical_to_spec(logical_axes))


# Regex rules mapping parameter tree paths -> logical axes. Applied in order;
# first match wins. Paths look like "llm/layers/attn/q_proj/kernel" after
# stacking (layers are scanned, adding a leading `layers` dim -> axis None).
_PATH_RULES = [
    # LLaMA
    (r"embed_tokens/embedding$", ("vocab", "embed")),
    (r"lm_head/kernel$", ("embed", "vocab")),
    (r"(q_proj|k_proj|v_proj)/kernel$", ("heads", "embed")),
    (r"o_proj/kernel$", ("heads", "embed")),
    (r"(gate_proj|up_proj)/kernel$", ("embed", "mlp")),
    (r"down_proj/kernel$", ("mlp", "embed")),
    # MoE expert stacks carry a leading expert dim
    (r"experts/(gate_proj|up_proj)/kernel$", ("expert", "embed", "mlp")),
    (r"experts/down_proj/kernel$", ("expert", "mlp", "embed")),
    # quantization scales ride the expert axis with their kernels so the
    # expert-parallel gmm (ops/moe._gmm_moe_ep) finds them pre-sharded:
    # scale [L, E, 1, N], scale4h [L, E, G, 1, N]
    (r"experts/.*/scale$", ("expert", None, None)),
    (r"experts/.*/scale4h$", ("expert", None, None, None)),
    (r"router/kernel$", ("embed", None)),
    # LoRA
    (r"lora_a$", ("embed", None)),
    (r"lora_b$", (None, "embed")),
]
_PATH_RULES_COMPILED = [(re.compile(p), ax) for p, ax in _PATH_RULES]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_spec(path, leaf) -> P:
    """PartitionSpec for one parameter, by path pattern."""
    s = _path_str(path)
    for rx, axes in _PATH_RULES_COMPILED:
        if rx.search(s):
            ndim = getattr(leaf, "ndim", len(axes))
            if ndim == len(axes) + 1:
                # scanned/stacked leading layer dim
                axes = (None,) + tuple(axes)
            elif ndim != len(axes):
                return P()
            return logical_to_spec(axes)
    return P()  # replicate by default (norms, biases, vision towers, SAM)


def param_sharding(mesh: Mesh, params: Any) -> Any:
    """NamedSharding pytree matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, param_spec(p, x)), params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Place a param pytree onto the mesh per the sharding rules."""
    shardings = param_sharding(mesh, params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs shard their leading batch dim over (data, expert): the expert
    axis doubles as extra data parallelism outside MoE blocks, the standard
    TPU MoE layout."""
    return NamedSharding(mesh, P((AXIS_DATA, AXIS_EXPERT)))
