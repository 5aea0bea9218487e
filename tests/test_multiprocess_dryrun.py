"""Reduced multi-host gate: 2 jax.distributed processes x 2 virtual CPU devices.

Runs the real pod-wiring validation (tools/multiprocess_dryrun.py — process-
sharded data loading, gloo collectives, SPMD train step, sharded predict
checksum, equality against a single-process run) at the smallest shape that
still exercises cross-process collectives, so multi-host wiring cannot rot
between the fuller 2x4 runs (VERDICT r2 item 7). Spawned as subprocesses:
jax.distributed cannot be initialized twice in-process, and this test file must
not poison the suite's JAX configuration."""

import os
import subprocess
import sys

import pytest

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO_ROOT, "tools", "multiprocess_dryrun.py")


@pytest.mark.slow
def test_two_process_dryrun_matches_single_process():
    result = subprocess.run(
        [sys.executable, _SCRIPT, "2", "2"],
        capture_output=True,
        text=True,
        timeout=1500,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=_REPO_ROOT,
    )
    assert result.returncode == 0, f"stdout:\n{result.stdout}\nstderr:\n{result.stderr}"
    assert "dryrun_multiprocess OK" in result.stdout
