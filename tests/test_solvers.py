"""Solver tests: CG and BiCGStab converge on SPD / general systems
(reference protocol: ``bench_cg.cpp`` final-residual check ``:410-415``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spmv_research_tpu.core.host import HostCSR
from spmv_research_tpu.convert import build_csr
from spmv_research_tpu.solvers import solve_cg, solve_bicgstab


def _spd_system(m, rng, density=0.04):
    import scipy.sparse as sp

    B = sp.random(m, m, density, random_state=np.random.RandomState(0))
    A = (B @ B.T + sp.identity(m) * (m * 0.5)).tocsr()
    A.sort_indices()
    h = HostCSR.from_scipy(A)
    x_true = rng.uniform(-1, 1, m)
    b = A @ x_true
    return h, b, x_true


def test_cg_converges(rng):
    h, b, x_true = _spd_system(200, rng)
    A = build_csr(h)
    x, info = solve_cg(h, A, b, max_iters=400, rtol=1e-6, impl="xla")
    assert bool(info["converged"]), dict(info)
    res = np.linalg.norm(h.to_scipy() @ np.asarray(x, np.float64) - b)
    assert res < 1e-4 * np.linalg.norm(b)


def test_cg_respects_max_iters(rng):
    h, b, _ = _spd_system(200, rng)
    A = build_csr(h)
    x, info = solve_cg(h, A, b, max_iters=3, rtol=1e-30, impl="xla")
    assert int(info["iterations"]) == 3


def test_bicgstab_converges_nonsymmetric(rng):
    import scipy.sparse as sp

    m = 150
    B = sp.random(m, m, 0.05, random_state=np.random.RandomState(1))
    A = (B + sp.identity(m) * m).tocsr()  # diagonally dominant, nonsymmetric
    A.sort_indices()
    h = HostCSR.from_scipy(A)
    x_true = rng.uniform(-1, 1, m)
    b = A @ x_true
    Ad = build_csr(h)
    x, info = solve_bicgstab(h, Ad, b, max_iters=300, rtol=1e-6, impl="xla")
    assert bool(info["converged"]), dict(info)
    np.testing.assert_allclose(np.asarray(x), x_true, rtol=1e-2, atol=1e-3)


def test_cg_with_bfly_format(rng):
    h, b, x_true = _spd_system(128, rng)
    from spmv_research_tpu.ops import build_bfly

    B = build_bfly(h)
    x, info = solve_cg(h, B, b, max_iters=300, rtol=1e-6, impl="xla")
    assert bool(info["converged"]), dict(info)


def test_cg_ic0_preconditioner(rng):
    """IC(0)-preconditioned CG (no reference analog — BASELINE config #4
    wiring): converges on an SPD system in no more iterations than
    Jacobi-CG, to a small true residual."""
    import scipy.sparse as sp
    from spmv_research_tpu.solvers.cg import solve_cg, solve_cg_ic0

    m = 400
    # SPD: 2-D Laplacian-like band + diagonal dominance
    A = sp.diags([-np.ones(m), 4.2 * np.ones(m), -np.ones(m),
                  -0.5 * np.ones(m), -0.5 * np.ones(m)],
                 [-1, 0, 1, -20, 20], shape=(m, m), format="csr")
    host = HostCSR.from_scipy(A)
    F = build_csr(host, dtype=jnp.float32)
    b = rng.uniform(0, 1, m)
    x_j, info_j = solve_cg(host, F, b, max_iters=200, rtol=1e-5)
    x_i, info_i = solve_cg_ic0(host, F, b, max_iters=200, rtol=1e-5)
    assert bool(info_i["converged"])
    assert int(info_i["iterations"]) <= int(info_j["iterations"])
    res = np.linalg.norm(A @ np.asarray(x_i, np.float64) - b)
    assert res / np.linalg.norm(b) < 1e-4


def test_bicgstab_ilu0_preconditioner(rng):
    """ILU(0)-preconditioned BiCGStab on a nonsymmetric diag-dominant
    system: converges at least as fast as Jacobi-BiCGStab."""
    import scipy.sparse as sp
    from spmv_research_tpu.solvers.cg import (solve_bicgstab,
                                              solve_bicgstab_ilu0)

    m = 300
    A = sp.diags([-1.3 * np.ones(m), 5.0 * np.ones(m), -0.7 * np.ones(m),
                  -0.9 * np.ones(m)], [-1, 0, 1, 15], shape=(m, m),
                 format="csr")
    host = HostCSR.from_scipy(A)
    F = build_csr(host, dtype=jnp.float32)
    b = rng.uniform(0, 1, m)
    x_j, info_j = solve_bicgstab(host, F, b, max_iters=200, rtol=1e-5)
    x_i, info_i = solve_bicgstab_ilu0(host, F, b, max_iters=200, rtol=1e-5)
    assert bool(info_i["converged"])
    assert int(info_i["iterations"]) <= int(info_j["iterations"])
    res = np.linalg.norm(A @ np.asarray(x_i, np.float64) - b)
    assert res / np.linalg.norm(b) < 1e-4
