"""CSRDS double-single SpMV: fp64-parity gate tests.

The reference gates fp64 kernels at 1e-10 relative error vs a _Float128
Kahan gold (``bench_spmv.cpp:61-64,114-119``). CSRDS must pass that gate
with fp64 inputs while computing entirely in fp32 pairs.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from spmv_research_tpu.core.host import HostCSR
from spmv_research_tpu.harness.metrics import (check_accuracy,
                                               error_metrics,
                                               _gold_vec_kahan)
from spmv_research_tpu.ops.compensated import (build_csrds, spmv_csrds_f64,
                                               spmv_csrds_xla)


def _host(mat):
    mat = mat.tocsr()
    mat.sort_indices()
    return HostCSR(ia=mat.indptr.astype(np.int32),
                   ja=mat.indices.astype(np.int32),
                   a=mat.data.astype(np.float64),
                   m=mat.shape[0], n=mat.shape[1])


@pytest.mark.parametrize("m,n,density", [(200, 150, 0.05), (64, 64, 0.3),
                                         (500, 500, 0.01)])
def test_csrds_fp64_gate(m, n, density):
    rng = np.random.RandomState(7)
    mat = sp.random(m, n, density=density, format="csr", random_state=rng,
                    data_rvs=lambda k: rng.uniform(-1, 1, k) * 1e3)
    host = _host(mat)
    A = build_csrds(host)
    x = np.random.default_rng(3).uniform(-1, 1, n) * 7.3
    y = spmv_csrds_f64(A, x)
    em = check_accuracy(host, x, y, value_dtype=np.float64)
    assert em.passed, f"max_rel_err={em.max_rel_err}"


def test_csrds_beats_plain_f32():
    """Ill-conditioned sums: plain fp32 fails the fp64 gate, CSRDS passes."""
    m = 8
    k = 2000
    rng = np.random.default_rng(11)
    # rows of many near-cancelling terms
    cols = np.tile(np.arange(k), m)
    rows = np.repeat(np.arange(m), k)
    pos = rng.uniform(1, 2, k // 2)
    # negatives nearly cancel the positives, leaving a small POSITIVE sum
    # (the reference gate only inspects entries with y_gold > epsilon)
    vals = np.tile(np.r_[pos, -pos * (1 - 1e-4)], m)
    mat = sp.csr_matrix((vals, (rows, cols)), shape=(m, k))
    host = _host(mat)
    x = np.ones(k)  # cancellation happens in the values themselves
    gold = np.asarray(_gold_vec_kahan(host, x), np.float64)
    y_f32 = (mat.astype(np.float32) @ x.astype(np.float32)).astype(np.float64)
    A = build_csrds(host)
    y_ds = spmv_csrds_f64(A, x)
    em32 = error_metrics(gold, y_f32, epsilon=1e-10)
    emds = error_metrics(gold, y_ds, epsilon=1e-10)
    assert not em32.passed            # fp32 cannot hold 1e-10 here
    assert emds.passed, f"max_rel_err={emds.max_rel_err}"


def test_csrds_long_skewed_rows():
    """Rows longer than SEG exercise the two-level segment combine."""
    rng = np.random.RandomState(5)
    m, n = 40, 3000
    rows, cols, vals = [], [], []
    g = np.random.default_rng(5)
    for r in range(m):
        deg = int(g.integers(1, 900))
        cs = np.unique(g.integers(0, n, deg))
        rows += [r] * len(cs)
        cols += cs.tolist()
        vals += g.standard_normal(len(cs)).tolist()
    mat = sp.csr_matrix((vals, (rows, cols)), shape=(m, n))
    host = _host(mat)
    A = build_csrds(host)
    x = g.uniform(-2, 2, n)
    y = spmv_csrds_f64(A, x)
    em = check_accuracy(host, x, y, value_dtype=np.float64)
    assert em.passed, f"max_rel_err={em.max_rel_err}"


def test_csrds_dispatch_f32_entry(square_csr):
    """The generic fp32 dispatch entry agrees with scipy at the fp32 gate."""
    import jax.numpy as jnp
    A = build_csrds(square_csr)
    x = np.random.default_rng(0).uniform(-1, 1, square_csr.n)
    x = x.astype(np.float32).astype(np.float64)  # fp32-representable
    y = np.asarray(spmv_csrds_xla(A, jnp.asarray(x, jnp.float32)))
    em = check_accuracy(square_csr, x, y.astype(np.float64), value_dtype=np.float32)
    assert em.passed


def test_csrds_empty_rows():
    mat = sp.csr_matrix((np.array([1.5, -2.0]),
                         (np.array([0, 3]), np.array([1, 2]))),
                        shape=(5, 4))
    host = _host(mat)
    A = build_csrds(host)
    x = np.array([1.0, 2.0, 3.0, 4.0])
    y = spmv_csrds_f64(A, x)
    assert np.allclose(y, mat @ x)
    assert y[1] == 0 and y[2] == 0 and y[4] == 0
