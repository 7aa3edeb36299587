"""Token sampling: temperature + nucleus (top-p) filtering.

Rebuild of the reference worker's decode-time sampling
(/root/reference/model/serve/model_worker.py:288-289 parses per-request
`temperature`/`top_p`; 420-425 does `argmax` when temperature < 1e-4 else
`multinomial(softmax(logits / temperature))`). The reference parses top_p
but never applies it; here it is honored (top_p=1.0 reproduces the
reference's pure temperature sampling exactly).

All inputs are traced values so one compiled program serves any
temperature/top_p; only the sample-vs-greedy choice is a static flag at the
call sites (greedy stays a pure argmax with no sort in the program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_token(key: jax.Array, logits: jnp.ndarray,
                 temperature: jnp.ndarray | float = 1.0,
                 top_p: jnp.ndarray | float = 1.0) -> jnp.ndarray:
    """Sample next tokens from [..., V] logits.

    temperature scales logits (clamped away from 0 — callers route
    temperature < 1e-4 to argmax, matching model_worker.py:420-425);
    top_p keeps the smallest prefix of the descending-probability vocab
    whose mass reaches top_p (the top-1 token is always kept).
    """
    t = jnp.asarray(temperature, jnp.float32)
    raw = logits.astype(jnp.float32)
    logits = raw / jnp.maximum(t, 1e-6)
    sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep token k iff the mass strictly before it is < top_p; the floor
    # keeps the top-1 token even at top_p=0.0 (a client-supplied value —
    # all--inf logits would otherwise degenerate to token 0)
    keep = (cum - probs) < jnp.maximum(jnp.asarray(top_p, jnp.float32),
                                       1e-9)
    min_kept = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                       keepdims=True)
    filtered = jnp.where(logits >= min_kept, logits, -jnp.inf)
    if key.ndim == 2:
        # per-ROW key streams [B, 2]: each row samples from its own RNG
        # stream, so one request's tokens don't depend on what else shares
        # the batch (continuous-batching engine, serve/engine.py)
        sampled = jax.vmap(jax.random.categorical)(key, filtered)
    else:
        sampled = jax.random.categorical(key, filtered, axis=-1)
    # rows whose temperature is below the greedy threshold take an EXACT
    # argmax (model_worker.py:420-425 routes temperature < 1e-4 to argmax) —
    # lets one compiled program serve a batch mixing greedy and sampled
    # requests (serve/engine.py) without tie-breaking drift at tiny t
    greedy_rows = jnp.broadcast_to(t, raw.shape)[..., 0] < 1e-4
    return jnp.where(greedy_rows, jnp.argmax(raw, axis=-1), sampled)


def select_token(logits: jnp.ndarray, key: jax.Array, do_sample: bool,
                 temperature, top_p) -> jnp.ndarray:
    """Greedy argmax (do_sample=False, static — keeps the greedy program
    sort-free) or temperature/top-p sampling."""
    if not do_sample:
        return jnp.argmax(logits, axis=-1)
    return sample_token(key, logits, temperature, top_p)


def row_keys(base: jax.Array, b: int) -> jax.Array:
    """[B, 2] independent per-row RNG streams from one base key (pass-through
    if already per-row). Per-row streams make a sampled request's tokens a
    function of its own seed alone — admissions into a shared decode batch
    (serve/engine.py) can't perturb it."""
    return base if base.ndim == 2 else jax.random.split(base, b)


def split_rows(keys: jax.Array):
    """Advance [B, 2] row streams one step -> (new_keys, subkeys)."""
    sp = jax.vmap(lambda k: jax.random.split(k))(keys)
    return sp[:, 0], sp[:, 1]
