"""Differential tests: every format's XLA SpMV/SpMM/SDDMM vs scipy fp64 gold.

This is the unit layer of the test pyramid (SURVEY.md §4): small random +
pathological matrices, every format builder, results vs scipy within fp32
tolerances.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_research_tpu.core.host import HostCSR, HostCOO
from spmv_research_tpu.convert import (
    build_csr, build_coo, build_ell, build_sellcs, build_bsr, build_dia,
    build_ldu, coo_to_csr,
)
from spmv_research_tpu.ops import spmv, spmm, sddmm
from conftest import random_host_csr

RTOL = 2e-5  # fp32 kernels vs fp64 gold
ATOL = 1e-5

BUILDERS = {
    "csr": build_csr,
    "coo": build_coo,
    "ell": build_ell,
    "sellcs": build_sellcs,
    "sellcs_c8s1": lambda h: build_sellcs(h, C=8, sigma=1),
    "bsr": lambda h: build_bsr(h, br=4, bc=8),
    "bsr_8x128": lambda h: build_bsr(h, br=8, bc=128),
}


def _pathological_matrices(rng):
    """Empty rows, single long row, dense row + empty tail, 1-col matrix."""
    out = []
    # empty rows interleaved
    rows = np.array([0, 0, 4, 4, 4], dtype=np.int32)
    cols = np.array([1, 3, 0, 2, 4], dtype=np.int32)
    vals = rng.uniform(-1, 1, 5)
    out.append(coo_to_csr(HostCOO(rows, cols, vals, 6, 5)))
    # one dense row (skew)
    m, n = 40, 40
    r = np.concatenate([np.zeros(n, np.int32), np.arange(1, m, dtype=np.int32)])
    c = np.concatenate([np.arange(n, dtype=np.int32), rng.integers(0, n, m - 1).astype(np.int32)])
    v = rng.uniform(-1, 1, r.size)
    out.append(coo_to_csr(HostCOO(r, c, v, m, n), sum_duplicates=True))
    # tall skinny
    out.append(random_host_csr(200, 3, 0.3, rng))
    # wide short
    out.append(random_host_csr(3, 200, 0.3, rng))
    return out


@pytest.mark.parametrize("fmt", sorted(BUILDERS))
def test_spmv_matches_scipy(fmt, rng):
    mats = [random_host_csr(100, 80, 0.05, rng),
            random_host_csr(64, 64, 0.2, rng)] + _pathological_matrices(rng)
    for h in mats:
        A = BUILDERS[fmt](h)
        x = rng.uniform(-1, 1, h.n)
        y_ref = h.to_scipy() @ x
        y = np.asarray(spmv(A, jnp.asarray(x, dtype=jnp.float32), impl="xla"))
        np.testing.assert_allclose(y, y_ref, rtol=RTOL, atol=ATOL)


def test_spmv_dia_banded(rng):
    import scipy.sparse as sp

    m = 64
    band = sp.diags([rng.uniform(-1, 1, m)] * 3, [-1, 0, 1], shape=(m, m)).tocsr()
    band.sort_indices()
    h = HostCSR.from_scipy(band)
    A = build_dia(h)
    x = rng.uniform(-1, 1, m)
    y = np.asarray(spmv(A, jnp.asarray(x, dtype=jnp.float32)))
    np.testing.assert_allclose(y, band @ x, rtol=RTOL, atol=ATOL)


def test_spmv_ldu(rng):
    import scipy.sparse as sp

    m = 50
    up = sp.random(m, m, 0.05, random_state=1)
    up = sp.triu(up, k=1)
    low = sp.coo_matrix((rng.uniform(-1, 1, up.nnz), (up.col, up.row)), shape=(m, m))
    full = (up + low + sp.diags(rng.uniform(1, 2, m))).tocsr()
    full.sort_indices()
    h = HostCSR.from_scipy(full)
    A = build_ldu(h)
    x = rng.uniform(-1, 1, m)
    y = np.asarray(spmv(A, jnp.asarray(x, dtype=jnp.float32)))
    np.testing.assert_allclose(y, full @ x, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("fmt", ["csr", "ell", "bsr_8x128"])
@pytest.mark.parametrize("k", [1, 8, 32])
def test_spmm_matches_scipy(fmt, k, rng):
    h = random_host_csr(96, 72, 0.08, rng)
    A = BUILDERS[fmt](h)
    X = rng.uniform(-1, 1, (h.n, k))
    Y_ref = h.to_scipy() @ X
    Y = np.asarray(spmm(A, jnp.asarray(X, dtype=jnp.float32), impl="xla"))
    np.testing.assert_allclose(Y, Y_ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k", [8, 64])
def test_sddmm_matches_numpy(k, rng):
    h = random_host_csr(60, 50, 0.1, rng)
    S = build_csr(h)
    A = rng.uniform(-1, 1, (h.m, k))
    B = rng.uniform(-1, 1, (h.n, k))
    vals = np.asarray(sddmm(S, jnp.asarray(A, jnp.float32), jnp.asarray(B, jnp.float32),
                            impl="xla"))
    # reference: per-nnz dot
    rows = np.repeat(np.arange(h.m), h.row_lengths())
    ref = np.sum(A[rows] * B[h.ja], axis=1)
    np.testing.assert_allclose(vals[: h.nnz], ref, rtol=RTOL, atol=ATOL)
    assert np.all(vals[h.nnz :] == 0)


def test_mem_footprint_ratio(rng):
    """Format footprint accounting vs the CSR baseline (mem_ratio column)."""
    h = random_host_csr(100, 100, 0.05, rng)
    csr = build_csr(h)
    assert csr.mem_footprint_bytes() == h.nnz * 8 + 101 * 4
    ell = build_ell(h)
    assert ell.mem_footprint_bytes() >= csr.mem_footprint_bytes() * 0.5


def test_csr_lut_spmv_and_footprint(rng):
    """Value-dedup LUT format: correct SpMV + smaller footprint when values
    repeat (reference csr_lut_x86.cpp role)."""
    import jax.numpy as jnp
    from spmv_research_tpu.ops.value_compress import build_csr_lut
    from spmv_research_tpu.core.host import HostCSR
    import scipy.sparse as sp

    m = 120
    S = sp.random(m, m, 0.08, random_state=3)
    # quantize values to 17 distinct levels
    S.data = np.round(S.data * 8) / 8.0 + 1.0
    S = S.tocsr(); S.sort_indices()
    h = HostCSR.from_scipy(S)
    A = build_csr_lut(h)
    assert A.n_unique <= 32
    assert A.val_idx.dtype == jnp.int8
    x = rng.uniform(-1, 1, m)
    y = np.asarray(spmv(A, jnp.asarray(x, jnp.float32), impl="xla"))
    np.testing.assert_allclose(y, S @ x, rtol=RTOL, atol=ATOL)
    from spmv_research_tpu.convert import build_csr as _bcsr
    assert A.mem_footprint_bytes() < _bcsr(h).mem_footprint_bytes()
    Y = np.asarray(spmm(A, jnp.asarray(rng.uniform(-1, 1, (m, 8)), jnp.float32),
                        impl="xla"))
    assert Y.shape == (m, 8)


def test_kmeans_reorder_preserves_spmv(rng):
    from spmv_research_tpu.convert import kmeans_reorder

    h = random_host_csr(150, 150, 0.05, rng)
    p, perm = kmeans_reorder(h, k=8)
    x = rng.uniform(-1, 1, 150)
    y_ref = h.to_scipy() @ x
    y_p = p.to_scipy() @ x
    np.testing.assert_allclose(y_p, y_ref[perm], rtol=1e-12)


def test_csr_sym_spmv(rng):
    """Symmetric-storage SpMV equals the expanded matrix (csr_sym.cpp role)."""
    import scipy.sparse as sp
    from spmv_research_tpu.convert import csr_drop_upper
    from spmv_research_tpu.convert.build import build_csr_sym

    m = 90
    B = sp.random(m, m, 0.06, random_state=1)
    A = (B + B.T + sp.diags(rng.uniform(1, 2, m))).tocsr()
    A.sort_indices()
    h = HostCSR.from_scipy(A)
    low = csr_drop_upper(h)
    S = build_csr_sym(low)
    assert S.mem_footprint_bytes() < build_csr(h).mem_footprint_bytes()
    x = rng.uniform(-1, 1, m)
    y = np.asarray(spmv(S, jnp.asarray(x, jnp.float32), impl="xla"))
    np.testing.assert_allclose(y, A @ x, rtol=RTOL, atol=ATOL)


def test_bcoo_vendor_adapter(rng):
    h = random_host_csr(80, 60, 0.08, rng)
    A = build_csr(h)
    x = rng.uniform(-1, 1, 60)
    y = np.asarray(spmv(A, jnp.asarray(x, jnp.float32), impl="bcoo"))
    np.testing.assert_allclose(y, h.to_scipy() @ x, rtol=RTOL, atol=ATOL)
