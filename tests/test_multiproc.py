"""Real 2-process jax.distributed run (CPU backend, Gloo collectives).

The single-process virtual mesh never exercises process boundaries; this
test spawns tools/multiproc_cpu_test.py, which builds the row-sharded CSR
over a 2-process x 4-device global mesh and gates allgather + ring
distributed SpMV against scipy (it caught two real multi-process
constraints: no closing over sharded arrays in an outer jit, and
global-array fetch via process_allgather).
"""
import os
import subprocess
import sys

import pytest


def test_two_process_distributed_spmv():
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "multiproc_cpu_test.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(script)], env=env,
            capture_output=True, text=True, timeout=240)
    except subprocess.TimeoutExpired:
        pytest.fail("2-process run timed out (coordinator port in use?)")
    if "Address already in use" in (out.stderr or ""):
        pytest.skip("coordinator port busy")
    assert "MULTIPROC OK" in out.stdout, out.stdout + out.stderr
