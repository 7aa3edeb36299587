"""Test harness: force JAX onto CPU with 8 virtual devices so DP/EP/TP
sharding and collectives are exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/tpu platform
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The session env pins JAX_PLATFORMS=axon (TPU tunnel); the config update is
# what actually wins over the plugin, the env var alone does not.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the suite's cost on this 1-core harness is
# dominated by XLA compiles; with a warm cache the quick tier re-runs in a
# fraction of the cold time (measured in README "Tests"). Safe for tests —
# entries key on HLO + compile options, so shape/flag changes re-compile.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_tests")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for tests"
