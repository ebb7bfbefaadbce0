"""Native-library parity tests: C++ fast paths == numpy fallbacks."""

import numpy as np
import pytest

from spmv_research_tpu.io.native import have_native
from conftest import random_host_csr

pytestmark = pytest.mark.skipif(not have_native(),
                                reason="native library not built")


def test_mtx_parse_parity(tmp_path, rng):
    from spmv_research_tpu.io import mtx_read, mtx_write
    from spmv_research_tpu.convert import csr_to_coo
    import spmv_research_tpu.io.native as native

    h = random_host_csr(50, 40, 0.1, rng)
    path = str(tmp_path / "t.mtx")
    mtx_write(path, csr_to_coo(h))
    coo_native = mtx_read(path)  # uses native when available
    # force numpy fallback
    saved = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        coo_np = mtx_read(path)
    finally:
        native._LIB, native._TRIED = saved
    np.testing.assert_array_equal(coo_native.rows, coo_np.rows)
    np.testing.assert_array_equal(coo_native.cols, coo_np.cols)
    np.testing.assert_allclose(coo_native.vals, coo_np.vals)


def test_coo_to_csr_parity(rng):
    from spmv_research_tpu.core.host import HostCOO
    from spmv_research_tpu.convert import coo_to_csr
    import spmv_research_tpu.io.native as native

    m, n, nnz = 80, 60, 400
    # unique coordinates (duplicate tie-order is unspecified between impls)
    flat = rng.choice(m * n, nnz, replace=False)
    coo = HostCOO((flat // n).astype(np.int32), (flat % n).astype(np.int32),
                  rng.uniform(-1, 1, nnz), m, n)
    c1 = coo_to_csr(coo)
    saved = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        c2 = coo_to_csr(coo)
    finally:
        native._LIB, native._TRIED = saved
    np.testing.assert_array_equal(c1.ia, c2.ia)
    np.testing.assert_array_equal(c1.ja, c2.ja)
    np.testing.assert_allclose(c1.a, c2.a)


def test_features_parity(rng):
    import spmv_research_tpu.io.native as native
    from spmv_research_tpu.convert.features import (
        row_neighbours_avg, cross_row_similarity_avg)

    h = random_host_csr(120, 120, 0.06, rng)
    a1 = row_neighbours_avg(h)
    b1 = cross_row_similarity_avg(h)
    saved = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        a2 = row_neighbours_avg(h)
        b2 = cross_row_similarity_avg(h)
    finally:
        native._LIB, native._TRIED = saved
    assert abs(a1 - a2) < 1e-12
    assert abs(b1 - b2) < 1e-12


def test_waksman_native_parity(rng):
    from spmv_research_tpu.ops.waksman import route_waksman
    from spmv_research_tpu.ops.routing import apply_pass_numpy

    for trial in range(10):
        rs = np.random.default_rng(trial)
        L = int(rs.integers(3, 10))
        N = 1 << L
        E = int(rs.integers(1, N))
        src = rs.choice(N, E, replace=False)
        tgt = rs.choice(N, E, replace=False)
        p = route_waksman(src, tgt, L, N, use_native=True)
        v = np.zeros(N)
        vv = rs.uniform(1, 2, E)
        v[src] = vv
        out = apply_pass_numpy(v, p)
        np.testing.assert_allclose(out[tgt], vv)


def test_rcm_native_valid_permutation(rng):
    from spmv_research_tpu.io.native import rcm_native

    h = random_host_csr(100, 100, 0.05, rng)
    perm = rcm_native(h.ia, h.ja, h.m)
    assert sorted(perm) == list(range(100))


def test_native_sellw_pack_matches_python(rng):
    """The native SELLW packer mirrors the Python tier bit-exactly."""
    import numpy as np
    from conftest import random_host_csr
    from spmv_research_tpu.io import native
    import spmv_research_tpu.ops.sellw as sw

    if not native.have_native():
        import pytest
        pytest.skip("native library not built")
    # banded + scattered + empty-block shapes
    import scipy.sparse as sp
    from spmv_research_tpu.core.host import HostCSR
    cases = [random_host_csr(700, 600, 0.02, rng),
             random_host_csr(150, 1030, 0.03, rng)]
    m = 500
    rows = np.repeat(np.arange(200, 260), 4)
    cols = np.clip(rows * 2 + rng.integers(-20, 21, rows.size), 0, 999)
    v = rng.uniform(-1, 1, rows.size)
    mat = sp.coo_matrix((v, (rows, cols)), shape=(m, 1000)).tocsr()
    mat.sum_duplicates(); mat.sort_indices()
    cases.append(HostCSR.from_scipy(mat))
    for host in cases:
        A_native = sw.build_sellw(host, max_chunk_factor=1e9)
        orig = native.have_sellw_pack
        native.have_sellw_pack = lambda *a, **k: False
        try:
            A_py = sw.build_sellw(host, max_chunk_factor=1e9)
        finally:
            native.have_sellw_pack = orig
        assert A_native.nchunks == A_py.nchunks
        assert A_native.stages == A_py.stages
        np.testing.assert_array_equal(np.asarray(A_native.word),
                                      np.asarray(A_py.word))
        np.testing.assert_array_equal(np.asarray(A_native.vals),
                                      np.asarray(A_py.vals))
        np.testing.assert_array_equal(np.asarray(A_native.wrow),
                                      np.asarray(A_py.wrow))
        np.testing.assert_array_equal(np.asarray(A_native.yidx),
                                      np.asarray(A_py.yidx))


def test_native_euler_edge_color_proper(rng):
    """Native Euler-split edge coloring (cycle walking) must produce a
    PROPER coloring — no two edges at one vertex share a color — on
    d-regular bipartite multigraphs, like the numpy tier it replaces
    (clos_route.euler_edge_color). Colorings need not be identical across
    tiers (any proper coloring routes), so the property is what's tested."""
    from spmv_research_tpu.io import native
    from spmv_research_tpu.ops.clos_route import euler_edge_color
    if not native.have_euler_edge_color():
        pytest.skip("native lib without euler_edge_color")
    nrng = np.random.default_rng(7)
    for nv, levels in [(8, 3), (64, 7), (1024, 10)]:
        deg = 1 << levels
        right = np.concatenate([nrng.permutation(nv) for _ in range(deg)])
        left = np.tile(np.arange(nv), deg)
        col_nat = native.euler_edge_color_native(left, right, levels)
        orig = native.have_euler_edge_color
        native.have_euler_edge_color = lambda: False
        try:
            col_py = euler_edge_color(left, right, levels)
        finally:
            native.have_euler_edge_color = orig
        for col in (col_nat, col_py):
            assert col.min() >= 0 and col.max() < deg
            for vert in (left, right):
                key = vert.astype(np.int64) * deg + col
                assert np.unique(key).size == left.size
