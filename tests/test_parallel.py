"""Distributed-layer tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spmv_research_tpu.parallel import (
    make_sparse_mesh, partition_rows_nnz_balanced, build_sharded_csr,
    distributed_spmv, distributed_cg_step,
)
from conftest import random_host_csr


def test_device_count():
    assert jax.device_count() >= 8


def test_nnz_balanced_partition(rng):
    h = random_host_csr(500, 500, 0.05, rng)
    splits = partition_rows_nnz_balanced(h, 8)
    assert splits[0] == 0 and splits[-1] == 500
    nnz_per = np.diff(h.ia[splits])
    # balanced within one max row length
    assert nnz_per.max() - nnz_per.min() <= h.row_lengths().max() + h.nnz / 8 * 0.5


@pytest.mark.parametrize("strategy", ["allgather", "ring"])
@pytest.mark.parametrize("ndev", [2, 8])
def test_distributed_spmv_matches_scipy(strategy, ndev, rng):
    h = random_host_csr(400, 400, 0.04, rng)
    mesh = make_sparse_mesh(ndev)
    A = build_sharded_csr(h, mesh)
    x = rng.uniform(-1, 1, 400)
    xd = A.pad_vector(x)
    y = distributed_spmv(A, xd, strategy=strategy)
    y_np = A.unpad_vector(y)
    np.testing.assert_allclose(y_np, h.to_scipy() @ x, rtol=2e-5, atol=1e-5)


def test_distributed_spmv_skewed_rows(rng):
    # one dense row to stress the nnz-balanced partition
    import scipy.sparse as sp

    m = 300
    base = sp.random(m, m, 0.02, random_state=0).tolil()
    base[5, :] = 1.0
    h_csr = base.tocsr()
    h_csr.sort_indices()
    from spmv_research_tpu.core.host import HostCSR

    h = HostCSR.from_scipy(h_csr)
    mesh = make_sparse_mesh(8)
    A = build_sharded_csr(h, mesh)
    x = rng.uniform(-1, 1, m)
    y = A.unpad_vector(distributed_spmv(A, A.pad_vector(x)))
    np.testing.assert_allclose(y, h.to_scipy() @ x, rtol=2e-5, atol=1e-5)


def test_distributed_cg_step_runs(rng):
    import scipy.sparse as sp

    m = 256
    Amat = sp.random(m, m, 0.03, random_state=1)
    spd = (Amat @ Amat.T + sp.identity(m) * m).tocsr()
    spd.sort_indices()
    from spmv_research_tpu.core.host import HostCSR

    h = HostCSR.from_scipy(spd)
    mesh = make_sparse_mesh(8)
    step = distributed_cg_step(h, mesh)
    x_new, rr = jax.block_until_ready(step())
    assert np.isfinite(float(rr))


def test_graft_entry_contract():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].m
    g.dryrun_multichip(8)


def test_weak_scaling_runs(rng):
    from spmv_research_tpu.parallel import weak_scaling_efficiency

    out = weak_scaling_efficiency(rows_per_device=2000, avg_nnz_per_row=5.0,
                                  device_counts=[1, 2])
    assert set(out) == {1, 2}
    assert out[1]["time"] > 0 and out[2]["time"] > 0


@pytest.mark.parametrize("ndev", [2, 8])
def test_distributed_spmv_psum_scatter(ndev, rng):
    from spmv_research_tpu.parallel import (build_col_sharded_csr,
                                            distributed_spmv_psum_scatter)

    h = random_host_csr(320, 320, 0.05, rng)
    mesh = make_sparse_mesh(ndev)
    A = build_col_sharded_csr(h, mesh)
    x = rng.uniform(-1, 1, 320)
    y = distributed_spmv_psum_scatter(A, A.pad_x(x))
    np.testing.assert_allclose(A.unpad_y(y), h.to_scipy() @ x,
                               rtol=2e-5, atol=1e-5)


def test_distributed_closg_8dev(rng):
    """Per-device routed programs over an nnz-balanced row split (MPMD)."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from spmv_research_tpu.core.host import HostCSR
    from spmv_research_tpu.parallel.dist_closg import (build_sharded_closg,
                                                       distributed_spmv_closg)

    mat = sp.random(1600, 1200, 0.01, random_state=11, format="csr")
    host = HostCSR.from_scipy(mat)
    devs = jax.devices()[:8]
    A = build_sharded_closg(host, devices=devs)
    assert A.k == 8
    # every shard actually lives on its own device
    placed = {d for s in A.shards
              for l in jax.tree_util.tree_leaves(s) for d in l.devices()}
    assert len(placed) == 8
    x = rng.uniform(-1, 1, 1200).astype(np.float32)
    y = np.asarray(distributed_spmv_closg(A, jnp.asarray(x)))
    want = mat @ x.astype(np.float64)
    assert np.allclose(y, want, atol=1e-4)


def test_distributed_best_mixed_engines(rng):
    """build_sharded_best picks SELLW on banded shards (kernel-selection-map
    role, per shard); mixed engines interoperate in one distributed SpMV."""
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from spmv_research_tpu.core.host import HostCSR
    from spmv_research_tpu.ops.sellw import SellW
    from spmv_research_tpu.parallel.dist_closg import (build_sharded_best,
                                                       distributed_spmv_closg)

    # banded matrix -> every shard has column locality -> SELLW everywhere
    m = n = 1600
    rows = np.repeat(np.arange(m), 4)
    cols = np.clip(rows + rng.integers(-30, 31, rows.size), 0, n - 1)
    v = rng.uniform(-1, 1, rows.size)
    mat = sp.coo_matrix((v, (rows, cols)), shape=(m, n)).tocsr()
    mat.sum_duplicates(); mat.sort_indices()
    host = HostCSR.from_scipy(mat)
    devs = jax.devices()[:4]
    A = build_sharded_best(host, devices=devs)
    assert all(isinstance(s, SellW) for s in A.shards)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = np.asarray(distributed_spmv_closg(A, jnp.asarray(x)))
    want = mat @ x.astype(np.float64)
    assert np.allclose(y, want, atol=1e-4)
