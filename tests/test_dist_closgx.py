"""SPMD distributed CLOSGX (scattered path): correctness on the virtual
8-device CPU mesh vs scipy, shard accounting, and uneven shapes."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
from jax.sharding import Mesh

from spmv_research_tpu.core.host import HostCSR
from spmv_research_tpu.parallel.dist_closgx import (build_dist_closgx,
                                                    dist_spmv_closgx_host)


def _host(mat):
    mat = mat.tocsr()
    mat.sort_indices()
    return HostCSR(ia=mat.indptr.astype(np.int32),
                   ja=mat.indices.astype(np.int32),
                   a=mat.data.astype(np.float64),
                   m=mat.shape[0], n=mat.shape[1])


def _mesh():
    return Mesh(np.array(jax.devices()), ("d",))


def test_dist_closgx_scattered_matches_scipy():
    rng = np.random.RandomState(3)
    mat = sp.random(3000, 3000, density=0.004, format="csr",
                    random_state=rng,
                    data_rvs=lambda k: rng.uniform(-1, 1, k))
    host = _host(mat)
    D = build_dist_closgx(host, _mesh(), chunk_N=1 << 14)
    x = np.random.default_rng(0).uniform(-1, 1, 3000)
    y = dist_spmv_closgx_host(D, x)
    gold = mat @ x
    assert np.abs(y - gold).max() <= 1e-5 * max(np.abs(gold).max(), 1)


def test_dist_closgx_shard_accounting():
    rng = np.random.RandomState(5)
    mat = sp.random(4000, 4000, density=0.003, format="csr",
                    random_state=rng)
    host = _host(mat)
    D = build_dist_closgx(host, _mesh(), chunk_N=1 << 14)
    assert len(D.shard_nnz) == 8 and sum(D.shard_nnz) == host.nnz
    # nnz balance within the 128-row alignment granularity
    assert max(D.shard_nnz) <= 2.0 * (host.nnz / 8) + 128 * 40
    # padding accounting is exposed for the weak-scaling model
    assert all(s >= n for s, n in zip(D.shard_slots, D.shard_nnz))


def test_dist_closgx_skewed_rows_and_rect():
    """Skewed row degrees + non-square shape."""
    rng = np.random.default_rng(11)
    m, n = 2500, 1800
    rows, cols = [], []
    for r in range(m):
        deg = 1 + int(rng.pareto(1.2))
        deg = min(deg, 200)
        cs = rng.integers(0, n, deg)
        rows += [r] * len(cs)
        cols += cs.tolist()
    vals = rng.standard_normal(len(rows))
    mat = sp.csr_matrix((vals, (rows, cols)), shape=(m, n))
    mat.sum_duplicates()
    host = _host(mat)
    D = build_dist_closgx(host, _mesh(), chunk_N=1 << 14)
    x = rng.uniform(-1, 1, n)
    y = dist_spmv_closgx_host(D, x)
    gold = mat @ x
    assert np.abs(y - gold).max() <= 1e-4 * max(np.abs(gold).max(), 1)
