"""DENSE fallback format: densified matvec for dense-row scattered
matrices (ops/densemv.py)."""
import numpy as np
import pytest
import scipy.sparse as sp

from spmv_research_tpu.core.host import HostCSR
from spmv_research_tpu.ops import spmv, spmm
from spmv_research_tpu.ops.densemv import (DenseBuildError, build_dense)


def _rand_csr(m, n, density, seed=3):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, format="csr", random_state=rng,
                  data_rvs=lambda k: rng.uniform(-1, 1, k))
    return HostCSR.from_scipy(A), A


def test_dense_spmv_matches_scipy():
    host, A = _rand_csr(301, 457, 0.05)
    D = build_dense(host)
    x = np.random.default_rng(5).uniform(0, 1, host.n)
    y = np.asarray(spmv(D, x, impl="xla"))
    np.testing.assert_allclose(y, A @ x, rtol=2e-5, atol=1e-5)
    assert D.format_name == "DENSE"
    assert D.mat.shape[0] % 8 == 0 and D.mat.shape[1] % 128 == 0


def test_dense_spmm_matches_scipy():
    host, A = _rand_csr(130, 77, 0.1)
    D = build_dense(host)
    X = np.random.default_rng(6).uniform(0, 1, (host.n, 16))
    Y = np.asarray(spmm(D, X, impl="xla"))
    np.testing.assert_allclose(Y, A @ X, rtol=2e-5, atol=1e-5)


def test_dense_budget_gate():
    host, _ = _rand_csr(64, 64, 0.2)
    with pytest.raises(DenseBuildError):
        build_dense(host, max_bytes=1024)


def test_dense_bench_row():
    """Full harness slice: bench_spmv emits a finite-accuracy row."""
    from spmv_research_tpu.harness import BenchConfig, bench_spmv
    host, _ = _rand_csr(260, 260, 0.08)
    D = build_dense(host)
    cfg = BenchConfig(min_num_loops=4, min_time_s=0.01)
    r = bench_spmv(host, D, config=cfg, impl="xla", matrix_name="dense_t")
    assert np.isfinite(r.metrics.mape) and r.metrics.mape < 1e-5
    assert r.nnz_per_s > 0
