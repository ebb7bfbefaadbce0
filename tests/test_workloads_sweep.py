"""Workload benchmarks + sweep driver tests (CPU, tiny protocol)."""

import os
import numpy as np
import pytest

from spmv_research_tpu.core.host import HostCSR
from spmv_research_tpu.convert import build_csr
from spmv_research_tpu.harness import (
    BenchConfig, bench_spmm, bench_sddmm, bench_cg, run_sweep,
)
from conftest import random_host_csr

TINY = BenchConfig(min_num_loops=2, min_time_s=0.01, inner_iters=2, k_dim=16)


def test_bench_spmm(rng):
    h = random_host_csr(128, 96, 0.06, rng)
    A = build_csr(h)
    r = bench_spmm(h, A, config=TINY, impl="xla", matrix_name="t")
    assert r.gflops > 0 and r.mape < 1e-5
    assert r.k == 16


def test_bench_sddmm(rng):
    h = random_host_csr(100, 120, 0.05, rng)
    S = build_csr(h)
    r = bench_sddmm(h, S, config=TINY, impl="xla", matrix_name="t")
    assert r.gflops > 0 and r.mape < 1e-5


def test_bench_cg_spd(rng):
    import scipy.sparse as sp

    m = 100
    B = sp.random(m, m, 0.05, random_state=np.random.RandomState(0))
    A = (B @ B.T + sp.identity(m) * m).tocsr()
    A.sort_indices()
    h = HostCSR.from_scipy(A)
    cfg = BenchConfig(min_num_loops=2, min_time_s=0.01, cg_max_num_iters=200)
    r = bench_cg(h, build_csr(h), config=cfg, impl="xla", matrix_name="t")
    assert r.extra["converged"]
    assert r.extra["relative_residual"] < 1e-3


def test_run_sweep_synthetic(tmp_path):
    specs = ["500 500 6 2 normal random 0.4 1.5 0.5 0.2 14 tiny"]
    results = run_sweep(specs, formats=["csr"], workloads=["spmv", "spmm"],
                        impls=["xla"], out_dir=str(tmp_path), config=TINY)
    assert len(results) == 2
    spmv_csv = tmp_path / "csr_spmv.csv"
    assert spmv_csv.exists()
    lines = spmv_csv.read_text().strip().splitlines()
    assert lines[0].startswith("matrix_name,distribution")  # synthetic schema
    assert len(lines) == 2


def test_run_sweep_mtx_file(tmp_path, rng):
    from spmv_research_tpu.io import mtx_write
    from spmv_research_tpu.convert import csr_to_coo

    h = random_host_csr(80, 80, 0.08, rng)
    path = str(tmp_path / "m.mtx")
    mtx_write(path, csr_to_coo(h))
    results = run_sweep([path], formats=["csr"], workloads=["spmv"],
                        impls=["xla"], out_dir=str(tmp_path / "out"),
                        config=TINY)
    assert len(results) == 1
    lines = (tmp_path / "out" / "csr_spmv.csv").read_text().strip().splitlines()
    assert lines[0].startswith("matrix_name,num_threads")  # real schema
    assert lines[1].startswith("m,")


def test_run_sweep_openfoam_ldu(tmp_path, rng):
    """OpenFOAM mesh dir → LDU-capable matrix through the harness."""
    d = tmp_path / "mesh"
    d.mkdir()
    (d / "owner").write_text("6 ( 0 0 1 2 3 4 )\n")
    (d / "neighbour").write_text("6 ( 1 2 2 3 4 5 )\n")
    from spmv_research_tpu.io import read_openfoam_matrix_dir
    from spmv_research_tpu.convert import coo_to_csr, build_ldu
    from spmv_research_tpu.ops import spmv
    import jax.numpy as jnp

    h = coo_to_csr(read_openfoam_matrix_dir(str(d)))
    A = build_ldu(h, face_align=8)
    x = rng.uniform(-1, 1, h.n)
    y = np.asarray(spmv(A, jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(y, h.to_scipy() @ x, rtol=2e-5, atol=1e-5)


def test_format_cache_roundtrip(tmp_path, rng):
    from spmv_research_tpu.convert import cached_build, build_csr
    from spmv_research_tpu.ops import build_bfly, spmv
    import jax.numpy as jnp

    h = random_host_csr(120, 120, 0.06, rng)
    calls = []

    def counting_builder(csr, **kw):
        calls.append(1)
        return build_bfly(csr, **kw)

    A1 = cached_build(counting_builder, h, "bfly", cache_dir=str(tmp_path))
    A2 = cached_build(counting_builder, h, "bfly", cache_dir=str(tmp_path))
    assert len(calls) == 1  # second call served from disk
    x = rng.uniform(-1, 1, 120)
    y1 = np.asarray(spmv(A1, jnp.asarray(x, jnp.float32), impl="xla"))
    y2 = np.asarray(spmv(A2, jnp.asarray(x, jnp.float32), impl="xla"))
    np.testing.assert_allclose(y1, y2)
    np.testing.assert_allclose(y1, h.to_scipy() @ x, rtol=3e-5, atol=2e-5)


def test_trace_region_runs():
    from spmv_research_tpu.utils import trace_region

    with trace_region("COMPUTATION-SpMV"):
        import jax.numpy as jnp
        _ = jnp.zeros(4) + 1


def test_spmm_sellg_vs_scipy(rng):
    import jax.numpy as jnp
    from conftest import random_host_csr
    from spmv_research_tpu.ops import build_sellg, spmm

    host = random_host_csr(300, 200, 0.02, rng)
    A = build_sellg(host)
    X = rng.uniform(-1, 1, (200, 16)).astype(np.float32)
    Y = np.asarray(spmm(A, jnp.asarray(X)))
    want = host.to_scipy() @ X.astype(np.float64)
    assert np.max(np.abs(Y - want)) < 1e-4


def test_spmm_sellg_skewed_rows(rng):
    import jax.numpy as jnp
    import scipy.sparse as sp
    from spmv_research_tpu.core.host import HostCSR
    from spmv_research_tpu.ops import build_sellg, spmm

    # one dense row + many tiny rows + empty rows
    m, n = 200, 150
    rows = np.concatenate([np.full(n, 3), np.arange(50) + 100])
    cols = np.concatenate([np.arange(n), rng.integers(0, n, 50)])
    vals = rng.uniform(-1, 1, rows.shape[0])
    mat = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    mat.sum_duplicates()
    host = HostCSR.from_scipy(mat)
    A = build_sellg(host)
    X = rng.uniform(-1, 1, (n, 8)).astype(np.float32)
    Y = np.asarray(spmm(A, jnp.asarray(X)))
    want = mat @ X.astype(np.float64)
    assert np.max(np.abs(Y - want)) < 1e-4


def test_sddmm_gather_vs_reference(rng):
    import jax.numpy as jnp
    from conftest import random_host_csr
    from spmv_research_tpu.convert import build_csr
    from spmv_research_tpu.ops import sddmm

    host = random_host_csr(300, 200, 0.02, rng)
    S = build_csr(host)
    A = rng.uniform(-1, 1, (300, 16)).astype(np.float32)
    B = rng.uniform(-1, 1, (200, 16)).astype(np.float32)
    got = np.asarray(sddmm(S, jnp.asarray(A), jnp.asarray(B), impl="gather"))
    want = np.asarray(sddmm(S, jnp.asarray(A), jnp.asarray(B), impl="xla"))
    assert np.max(np.abs(got[: host.nnz] - want[: host.nnz])) < 1e-4


def test_bench_spgemm_and_trisolve(rng):
    """BASELINE config #4 workloads produce validated results."""
    from conftest import random_host_csr
    from spmv_research_tpu.harness import BenchConfig
    from spmv_research_tpu.harness.workloads import (bench_spgemm,
                                                     bench_trisolve)

    import scipy.sparse as sp
    from spmv_research_tpu.core.host import HostCSR

    host = random_host_csr(300, 300, 0.02, rng)
    cfg = BenchConfig(min_num_loops=2, min_time_s=0.01)
    r = bench_spgemm(host, config=cfg, matrix_name="t")
    assert r.max_ae < 1e-5 and r.gflops >= 0
    # ILU0 needs stable pivots: diagonally dominant SPD-ish matrix
    mat = host.to_scipy()
    dd = (mat + mat.T + sp.diags(np.abs(mat).sum(1).A1
                                 + np.abs(mat).sum(0).A1 + 1.0)).tocsr()
    dd.sum_duplicates(); dd.sort_indices()
    host_dd = HostCSR.from_scipy(dd)
    r2 = bench_trisolve(host_dd, config=cfg, matrix_name="t")
    assert r2.max_ae < 1e-4
    assert r2.extra["n_levels_L"] >= 1


def test_bench_sddmm_btile_slab(square_csr):
    """BTILE returns a tile slab; bench_sddmm must validate via the
    structural slab->CSR extraction (regression: round-3 sweep crash)."""
    from spmv_research_tpu.harness.workloads import bench_sddmm
    from spmv_research_tpu.harness.config import BenchConfig
    from spmv_research_tpu.ops.btile import build_btile
    S = build_btile(square_csr)
    cfg = BenchConfig(min_num_loops=1, min_time_s=0.0, k_dim=16)
    r = bench_sddmm(square_csr, S, config=cfg, impl="xla",
                    matrix_name="sq")
    assert r.mape < 1e-5
