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
