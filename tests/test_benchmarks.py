"""Smoke: the 5-config benchmark harness runs end-to-end at tiny scale."""

import pytest
import json
import subprocess
import sys


@pytest.mark.slow
def test_run_all_tiny_emits_all_configs():
    r = subprocess.run(
        [sys.executable, "benchmarks/run_all.py", "--tiny"],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(line) for line in r.stdout.splitlines()
            if line.startswith("{")]
    configs = {row["config"] for row in rows}
    assert configs == {1, 2, 3, 4, 5, 6, 7, 8, 9, 10}
    assert all(row["value"] > 0 for row in rows)
