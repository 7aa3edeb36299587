"""Driver-invocation tests for __graft_entry__.

Round-1 verdict: the driver imports `__graft_entry__` and calls
`dryrun_multichip(8)` in-process on an already-initialized 1-chip backend,
and that path had never been tested (MULTICHIP_r01 rc=1). These tests call
it exactly as the driver does — both when the current process has enough
devices and when it has only one (subprocess simulating the axon driver).
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_in_process():
    """With >=8 devices visible (conftest forces 8 CPU), the call runs the
    body directly in-process."""
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_driver_path_single_device():
    """Driver-identical invocation: a process whose backend has ONE device
    imports __graft_entry__ and calls dryrun_multichip(8) with no env
    pre-set. It must self-provision a virtual 8-device CPU mesh and pass."""
    env = dict(os.environ)
    # Strip the test harness's forced device count so the child sees 1 CPU
    # device, like the driver's 1-chip axon backend.
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split()
                     if "host_platform_device_count" not in f)
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"  # don't grab the real TPU from a test
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout


def test_entry_traces():
    """entry()'s forward must trace under jit (abstract eval — the driver
    does the real single-chip compile; this guards Python/shape errors)."""
    from medplib_tpu.models import medplib

    from medplib_tpu.utils import quantize as qz

    cfg = graft._flagship_cfg(num_layers=32)  # entry() runs FULL depth now
    rng = np.random.default_rng(0)
    params_shapes = jax.eval_shape(
        lambda k: medplib.init_medplib(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0))
    # entry() quantizes to the int8 serving config before the forward
    params_shapes = jax.eval_shape(qz.quantize_tree, params_shapes)
    batch = graft._make_batch(cfg, B=1, T=32, rng=rng)

    def fn(params, batch):
        return medplib.model_forward(params, cfg, batch, train=True,
                                     remat=True)["loss"]

    out = jax.eval_shape(fn, params_shapes, batch)
    assert out.shape == ()
