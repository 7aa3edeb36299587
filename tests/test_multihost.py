"""Multihost: 2-process JAX distributed runtime over virtual CPU devices.

Covers init_distributed + host_local_batch_to_global + a cross-process
gradient reduction (the DCN data-parallel story of SURVEY §2.4, replacing
the reference's multi-node DeepSpeed launcher handshake,
train_ds_medplib.py:383-420).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dryrun():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "dryrun_multihost.py")],
        capture_output=True, text=True, timeout=580, cwd=REPO)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "MULTIHOST DRYRUN OK" in r.stdout
    # both ranks agree on the global loss -> the reduction crossed processes
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT")]
    assert len(lines) == 2
    assert lines[0].split("loss=")[1] == lines[1].split("loss=")[1]
