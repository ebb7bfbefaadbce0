"""SpGEMM and ILU0/IC0 + triangular-solve tests (BASELINE config #4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_research_tpu.core.host import HostCSR
from spmv_research_tpu.ops.spgemm import spgemm, spgemm_symbolic
from spmv_research_tpu.solvers.ilu import (
    ilu0, ic0, build_level_schedule, sptrsv, ilu0_solve,
)
from conftest import random_host_csr


def test_spgemm_matches_scipy(rng):
    for (m, k, n, da, db) in [(50, 40, 60, 0.1, 0.1), (80, 80, 80, 0.05, 0.08)]:
        A = random_host_csr(m, k, da, rng)
        B = random_host_csr(k, n, db, rng)
        C = spgemm(A, B)
        ref = (A.to_scipy() @ B.to_scipy()).tocsr()
        ref.sort_indices()
        np.testing.assert_array_equal(C.ia, ref.indptr)
        np.testing.assert_array_equal(C.ja, ref.indices)
        np.testing.assert_allclose(C.a, ref.data, rtol=3e-5, atol=1e-5)


def test_spgemm_a_squared(rng):
    A = random_host_csr(64, 64, 0.08, rng)
    C = spgemm(A, A)
    ref = (A.to_scipy() @ A.to_scipy()).tocsr()
    ref.sort_indices()
    np.testing.assert_allclose(C.a, ref.data, rtol=3e-5, atol=1e-5)


def test_spgemm_plan_reuse(rng):
    A = random_host_csr(40, 40, 0.1, rng)
    plan = spgemm_symbolic(A, A)
    v1 = plan.numeric(jnp.asarray(A.a, jnp.float32), jnp.asarray(A.a, jnp.float32))
    # new values, same pattern
    a2 = A.a * 2.0
    v2 = plan.numeric(jnp.asarray(a2, jnp.float32), jnp.asarray(a2, jnp.float32))
    np.testing.assert_allclose(np.asarray(v2), 4 * np.asarray(v1), rtol=1e-6)


def _dd_matrix(m, rng, density=0.06):
    import scipy.sparse as sp

    B = sp.random(m, m, density, random_state=np.random.RandomState(2),
                  data_rvs=lambda k: rng.uniform(-1, 1, k))
    A = (B + sp.identity(m) * (m * 0.2)).tocsr()
    A.sort_indices()
    return HostCSR.from_scipy(A)


def test_ilu0_exact_on_full_pattern(rng):
    """On a dense-pattern matrix, ILU0 == exact LU ⇒ L@U == A."""
    import scipy.sparse as sp

    m = 12
    D = rng.uniform(-1, 1, (m, m)) + np.eye(m) * m
    h = HostCSR.from_scipy(sp.csr_matrix(D))
    L, U = ilu0(h)
    prod = L.to_scipy() @ U.to_scipy()
    np.testing.assert_allclose(prod.toarray(), D, rtol=1e-10, atol=1e-10)


def test_ilu0_preconditioner_quality(rng):
    h = _dd_matrix(100, rng)
    L, U = ilu0(h)
    Ls = build_level_schedule(L, lower=True)
    Us = build_level_schedule(U, lower=False)
    b = rng.uniform(-1, 1, 100)
    x = np.asarray(ilu0_solve(Ls, Us, jnp.asarray(b, jnp.float32)), np.float64)
    # M = LU approximates A: ||A x - b|| should be much smaller than ||b||
    res = np.linalg.norm(h.to_scipy() @ x - b) / np.linalg.norm(b)
    assert res < 0.5, res


def test_sptrsv_lower_and_upper(rng):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    m = 80
    h = _dd_matrix(m, rng)
    L, U = ilu0(h)
    b = rng.uniform(-1, 1, m)
    for T, lower in [(L, True), (U, False)]:
        sched = build_level_schedule(T, lower=lower)
        x = np.asarray(sptrsv(sched, jnp.asarray(b, jnp.float32)), np.float64)
        ref = spla.spsolve_triangular(T.to_scipy().tocsr(), b, lower=lower,
                                      unit_diagonal=False)
        np.testing.assert_allclose(x, ref, rtol=2e-4, atol=2e-4)


def test_ic0_on_spd(rng):
    import scipy.sparse as sp

    m = 60
    B = sp.random(m, m, 0.08, random_state=np.random.RandomState(3))
    A = (B @ B.T + sp.identity(m) * m).tocsr()
    A.sort_indices()
    h = HostCSR.from_scipy(A)
    Lc = ic0(h)
    # L Lᵀ should approximate A on its pattern; diag exact on dense rows
    prod = (Lc.to_scipy() @ Lc.to_scipy().T).toarray()
    Ad = A.toarray()
    # compare on A's lower pattern
    mask = (np.tril(Ad) != 0)
    rel = np.abs(prod - Ad)[mask] / (np.abs(Ad)[mask] + 1e-12)
    assert np.median(rel) < 0.3


def test_cg_with_ilu0_preconditioner(rng):
    """CG accepts a custom preconditioner apply (framework composition)."""
    import scipy.sparse as sp

    m = 120
    B = sp.random(m, m, 0.05, random_state=np.random.RandomState(4))
    A = (B @ B.T + sp.identity(m) * (m * 0.3)).tocsr()
    A.sort_indices()
    h = HostCSR.from_scipy(A)
    from spmv_research_tpu.convert import build_csr
    from spmv_research_tpu.solvers import solve_cg

    Ad = build_csr(h)
    b = rng.uniform(-1, 1, m)
    x, info = solve_cg(h, Ad, b, max_iters=400, rtol=1e-6, impl="xla")
    assert bool(info["converged"])
