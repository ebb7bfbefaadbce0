"""Band-block MXU triangular solve (solvers/ilu.py BandBlockSchedule)."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from spmv_research_tpu.core.host import HostCSR
from spmv_research_tpu.solvers.ilu import (
    BandBlockSchedule, BandScheduleError, build_band_block_schedule,
    build_schedule, sptrsv)


def _banded_lower(m, band, seed=0, unit_diag=False):
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for i in range(m):
        lo = max(0, i - band)
        js = rng.choice(np.arange(lo, i), size=min(4, i - lo),
                        replace=False) if i > lo else []
        for j in js:
            rows.append(i)
            cols.append(j)
        rows.append(i)
        cols.append(i)
    vals = rng.uniform(0.5, 1.5, len(rows))
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, m)).tocsr()
    d = A.diagonal()
    A.setdiag(1.0 if unit_diag else d + 4.0)
    return A


@pytest.mark.parametrize("m,band,B", [(300, 40, 128), (700, 300, 128),
                                      (1000, 129, 128)])
def test_band_lower_matches_scipy(m, band, B):
    A = _banded_lower(m, band, seed=m)
    host = HostCSR.from_scipy(A)
    s = build_band_block_schedule(host, lower=True, B=B)
    assert isinstance(s, BandBlockSchedule) and s.Q >= 1
    b = np.random.default_rng(5).uniform(-1, 1, m)
    x = np.asarray(sptrsv(s, b), np.float64)
    ref = spla.spsolve_triangular(A.tocsr(), b, lower=True)
    np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)


def test_band_upper_matches_scipy():
    m, band = 500, 100
    L = _banded_lower(m, band, seed=11)
    U = sp.csr_matrix(L.T)
    host = HostCSR.from_scipy(U)
    s = build_band_block_schedule(host, lower=False, B=128)
    b = np.random.default_rng(6).uniform(-1, 1, m)
    x = np.asarray(sptrsv(s, b), np.float64)
    ref = spla.spsolve_triangular(U, b, lower=False)
    np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)


def test_band_budget_gate_falls_back():
    m = 400
    A = _banded_lower(m, 300, seed=3)
    host = HostCSR.from_scipy(A)
    with pytest.raises(BandScheduleError):
        build_band_block_schedule(host, B=128, max_bytes=1000)
    s = build_schedule(host, lower=True)   # auto path still solves
    b = np.random.default_rng(7).uniform(-1, 1, m)
    x = np.asarray(sptrsv(s, b), np.float64)
    ref = spla.spsolve_triangular(A.tocsr(), b, lower=True)
    np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)


def test_band_outlier_channel():
    # narrow band + a few far-reaching entries: band shrinks to budget and
    # the outliers ride the gather channel
    m = 1200
    A = _banded_lower(m, 60, seed=21).tolil()
    rng = np.random.default_rng(4)
    for i in rng.integers(700, m, 15):
        A[int(i), int(rng.integers(0, 80))] = rng.uniform(0.1, 0.5)
    A = A.tocsr()
    host = HostCSR.from_scipy(A)
    # budget allows Q=1 only (K=10 blocks of 128): force the outlier path
    s = build_band_block_schedule(host, lower=True, B=128,
                                  max_bytes=10 * 128 * 128 * 4 * 2 + 64)
    assert s.olvals.shape[1] > 0 and s.Q == 1
    b = np.random.default_rng(8).uniform(-1, 1, m)
    x = np.asarray(sptrsv(s, b), np.float64)
    ref = spla.spsolve_triangular(A, b, lower=True)
    np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)


def test_band_outlier_upper():
    m = 900
    L = _banded_lower(m, 50, seed=31).tolil()
    rng = np.random.default_rng(5)
    for i in rng.integers(0, 150, 10):
        L[int(rng.integers(750, m)), int(i)] = rng.uniform(0.1, 0.5)
    U = sp.csr_matrix(L.tocsr().T)
    host = HostCSR.from_scipy(U)
    s = build_band_block_schedule(host, lower=False, B=128,
                                  max_bytes=8 * 128 * 128 * 4 * 2 + 64)
    assert s.olvals.shape[1] > 0
    b = np.random.default_rng(9).uniform(-1, 1, m)
    x = np.asarray(sptrsv(s, b), np.float64)
    ref = spla.spsolve_triangular(U, b, lower=False)
    np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)
