from medplib_tpu.ops.norms import rms_norm, layer_norm  # noqa: F401
from medplib_tpu.ops.rope import rope_freqs, apply_rope  # noqa: F401
from medplib_tpu.ops.attention import causal_attention, decode_attention  # noqa: F401
from medplib_tpu.ops.initializers import (  # noqa: F401
    dense_init, embed_init, zeros_init,
)
