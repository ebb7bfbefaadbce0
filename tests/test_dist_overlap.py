"""Round-4 distributed additions: allgather-overlap DistClosGX and the
block-sliced CSR ring (retiring the O(k·nnz) masked ring)."""
import numpy as np
import pytest
import scipy.sparse as sp
import jax

from spmv_research_tpu.core.host import HostCSR


def _mesh():
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:8]).reshape(8), ("d",))


def _rand_host(m, density, seed=0):
    A = sp.random(m, m, density, random_state=np.random.RandomState(seed),
                  format="csr")
    A.sort_indices()
    return HostCSR(ia=A.indptr.astype(np.int32),
                   ja=A.indices.astype(np.int32),
                   a=A.data.astype(np.float64), m=m, n=m), A


@pytest.mark.parametrize("overlap", [False, True])
def test_dist_closgx_overlap_matches_scipy(overlap):
    from spmv_research_tpu.parallel.dist_closgx import (
        build_dist_closgx, dist_spmv_closgx_host)
    host, A = _rand_host(3000, 0.003, seed=3)
    mesh = _mesh()
    D = build_dist_closgx(host, mesh, chunk_N=1 << 14, overlap=overlap)
    assert D.overlapped == overlap
    x = np.random.default_rng(1).standard_normal(host.m)
    y = dist_spmv_closgx_host(D, x)
    ref = A @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5


def test_dist_closgx_overlap_empty_local_blocks():
    # a matrix whose columns all land in one x shard: most devices get an
    # EMPTY local family (exercises the inert-dummy path)
    m = 2000
    rng = np.random.default_rng(4)
    rows = rng.integers(0, m, 4000)
    cols = rng.integers(0, 120, 4000)          # all in shard 0's x block
    A = sp.csr_matrix((rng.standard_normal(4000), (rows, cols)),
                      shape=(m, m))
    A.sum_duplicates()
    A.sort_indices()
    host = HostCSR(ia=A.indptr.astype(np.int32),
                   ja=A.indices.astype(np.int32),
                   a=A.data.astype(np.float64), m=m, n=m)
    from spmv_research_tpu.parallel.dist_closgx import (
        build_dist_closgx, dist_spmv_closgx_host)
    D = build_dist_closgx(host, _mesh(), chunk_N=1 << 13, overlap=True)
    x = rng.standard_normal(m)
    y = dist_spmv_closgx_host(D, x)
    ref = A @ x
    assert np.abs(y - ref).max() / max(np.abs(ref).max(), 1e-30) < 2e-5


def test_ring_blocked_layout_built_and_correct():
    from spmv_research_tpu.parallel.dist import (build_sharded_csr,
                                                 distributed_spmv)
    host, A = _rand_host(1600, 0.01, seed=5)
    mesh = _mesh()
    S = build_sharded_csr(host, mesh, axis="d")
    assert S.data_blk is not None       # uniform columns: within budget
    x = np.random.default_rng(2).standard_normal(host.m)
    xp = S.pad_vector(x)
    y = S.unpad_vector(distributed_spmv(S, xp, strategy="ring"))
    ref = A @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 2e-5
    # blocked layout total work is O(nnz + k*pad), not O(k*nnz)
    assert S.data_blk.shape[1] * S.k <= 4 * S.data.shape[1]
