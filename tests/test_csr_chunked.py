"""Chunked CSR baseline (ops/csr_chunked.py): the crash-safe XL fallback."""
import numpy as np
import scipy.sparse as sp

from spmv_research_tpu.core.host import HostCSR
from spmv_research_tpu.ops import spmv, spmm
from spmv_research_tpu.ops.csr_chunked import build_csr_chunked


def _rand_csr(m, n, density, seed=3):
    rng = np.random.default_rng(seed)
    A = sp.random(m, n, density=density, format="csr", random_state=rng,
                  data_rvs=lambda k: rng.uniform(-1, 1, k))
    return HostCSR.from_scipy(A), A


def test_chunked_spmv_matches_scipy_multi_block():
    host, A = _rand_csr(900, 700, 0.05)
    # force many blocks so rows cross block boundaries
    C = build_csr_chunked(host, block=1 << 10)
    assert C.data.shape[0] > 3
    x = np.random.default_rng(5).uniform(0, 1, host.n)
    y = np.asarray(spmv(C, x, impl="xlac"))
    np.testing.assert_allclose(y, A @ x, rtol=2e-5, atol=1e-5)


def test_chunked_spmv_single_block_and_empty_rows():
    rng = np.random.default_rng(9)
    # long empty-row stretches: R spans many rows per block
    rows = np.array([0, 0, 5, 5, 5, 199, 200, 399])
    cols = rng.integers(0, 50, rows.size)
    vals = rng.uniform(-1, 1, rows.size)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(400, 50)).tocsr()
    A.sum_duplicates()
    host = HostCSR.from_scipy(A)
    C = build_csr_chunked(host, block=4)
    x = rng.uniform(0, 1, 50)
    y = np.asarray(spmv(C, x, impl="xlac"))
    np.testing.assert_allclose(y, A @ x, rtol=2e-5, atol=1e-6)


def test_chunked_spmm_matches_scipy():
    host, A = _rand_csr(257, 123, 0.08)
    C = build_csr_chunked(host, block=1 << 10)
    X = np.random.default_rng(6).uniform(0, 1, (host.n, 8))
    Y = np.asarray(spmm(C, X, impl="xlac"))
    np.testing.assert_allclose(Y, A @ X, rtol=2e-5, atol=1e-5)


def test_chunked_row_boundary_accumulation():
    # one huge row split across every block: carried-y accumulation path
    m, n = 3, 64
    nnz = 4096
    rng = np.random.default_rng(11)
    cols = rng.integers(0, n, nnz)
    vals = rng.uniform(-1, 1, nnz)
    rows = np.full(nnz, 1)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    A.sum_duplicates()
    host = HostCSR.from_scipy(A)
    C = build_csr_chunked(host, block=256)
    x = rng.uniform(0, 1, n)
    y = np.asarray(spmv(C, x, impl="xlac"))
    np.testing.assert_allclose(y, A @ x, rtol=1e-4, atol=1e-5)
