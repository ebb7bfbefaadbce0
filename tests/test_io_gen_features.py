"""Tests: MatrixMarket I/O, OpenFOAM reader, feature extraction, generator."""

import os
import numpy as np
import pytest

from spmv_research_tpu.io import mtx_read, mtx_write, read_openfoam_matrix_dir
from spmv_research_tpu.core.host import HostCOO
from spmv_research_tpu.convert import coo_to_csr, extract_features
from spmv_research_tpu.gen import ArtificialParams, artificial_matrix_generation
from conftest import random_host_csr


def test_mtx_roundtrip(tmp_path, rng):
    h = random_host_csr(40, 30, 0.1, rng)
    from spmv_research_tpu.convert import csr_to_coo

    coo = csr_to_coo(h)
    path = str(tmp_path / "t.mtx")
    mtx_write(path, coo)
    back = mtx_read(path)
    csr2 = coo_to_csr(back)
    np.testing.assert_array_equal(csr2.ia, h.ia)
    np.testing.assert_array_equal(csr2.ja, h.ja)
    np.testing.assert_allclose(csr2.a, h.a, rtol=1e-14)


def test_mtx_symmetric_expansion(tmp_path):
    path = str(tmp_path / "s.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("% comment line\n")
        f.write("3 3 4\n1 1 2.0\n2 1 -1.0\n3 2 4.0\n3 3 1.0\n")
    coo = mtx_read(path, expand_symmetry=True)
    assert coo.nnz == 6  # 2 diag + 2×2 off-diag
    dense = coo_to_csr(coo).to_scipy().toarray()
    np.testing.assert_allclose(dense, dense.T)
    assert dense[0, 1] == -1.0 and dense[1, 0] == -1.0


def test_mtx_pattern_and_stored_symmetry(tmp_path):
    path = str(tmp_path / "p.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write("3 3 2\n2 1\n3 3\n")
    coo = mtx_read(path, expand_symmetry=False, pattern_dummy_value=1.0)
    assert coo.symmetric
    assert coo.nnz == 2
    assert np.all(coo.vals == 1.0)
    csr = coo_to_csr(coo)
    assert csr.symmetric_storage
    assert csr.nnz_expanded == 3  # one off-diag pair + one diag


def test_openfoam_reader(tmp_path):
    d = tmp_path / "mesh"
    d.mkdir()
    (d / "owner").write_text("FoamFile\n{\n  class labelList;\n}\n4 ( 0 0 1 2 )\n")
    (d / "neighbour").write_text("4 ( 1 2 2 3 )\n")
    coo = read_openfoam_matrix_dir(str(d))
    assert coo.m == 4
    dense = coo_to_csr(coo).to_scipy().toarray()
    np.testing.assert_allclose(dense, dense.T)  # structurally symmetric
    assert np.all(np.diag(dense) == 1)


def test_features_on_known_matrix():
    """Hand-checkable 4×6 matrix; definitions match csr_util_gen.c exactly."""
    # row0: cols 0,1,2 (run of 3); row1: empty; row2: cols 0,5; row3: col 1
    coo = HostCOO(
        rows=np.array([0, 0, 0, 2, 2, 3], dtype=np.int32),
        cols=np.array([0, 1, 2, 0, 5, 1], dtype=np.int32),
        vals=np.ones(6),
        m=4, n=6,
    )
    csr = coo_to_csr(coo)
    f = extract_features(csr)
    assert f.nnz == 6
    assert f.nnz_per_row_max == 3 and f.nnz_per_row_min == 0
    # bandwidths: row0: 2, row1: 0, row2: 5, row3: 0 → avg 7/4
    np.testing.assert_allclose(f.bw_avg, 7 / 4)
    # skew = (3 - 1.5)/1.5 = 1
    np.testing.assert_allclose(f.skew, 1.0)
    # neighbours (w=1): row0 has pairs (0,1),(1,2) → counts 1,2,1; others 0 → avg 4/6
    np.testing.assert_allclose(f.num_neighbours_avg, 4 / 6)
    # cross-row similarity w=1: row0 vs row2: cols {0,1,2} vs {0,5}: matches 0→0,1→0,2→no
    #   → 2/3; row2 vs row3: {0,5} vs {1}: 0→1 match, 5→no → 1/2; row3 (last) → 0
    np.testing.assert_allclose(f.cross_row_similarity_avg, (2 / 3 + 1 / 2 + 0) / 3)


def test_generator_determinism():
    p = ArtificialParams(500, 500, 8.0, 3.0, "normal", "random", bw=0.3,
                         skew=2.0, avg_num_neighbours=0.8,
                         cross_row_similarity=0.5, seed=42)
    a1, f1 = artificial_matrix_generation(p)
    a2, f2 = artificial_matrix_generation(p)
    np.testing.assert_array_equal(a1.ja, a2.ja)
    np.testing.assert_array_equal(a1.ia, a2.ia)
    np.testing.assert_allclose(a1.a, a2.a)


def test_generator_valid_csr():
    for placement in ["random", "diagonal", "diagonal_0.3", "simple"]:
        p = ArtificialParams(300, 300, 10.0, 4.0, "gamma", placement, bw=0.4,
                             skew=5.0, avg_num_neighbours=1.0,
                             cross_row_similarity=0.3, seed=7)
        csr, f = artificial_matrix_generation(p)
        assert csr.nnz > 0
        # strictly increasing columns within rows (unique)
        for i in range(csr.m):
            seg = csr.ja[csr.ia[i]: csr.ia[i + 1]]
            assert np.all(np.diff(seg) > 0), f"row {i} not strictly increasing"
        assert csr.ja.min() >= 0 and csr.ja.max() < 300


def test_generator_hits_feature_targets():
    """Measured features approximate requested parameters (twin property)."""
    p = ArtificialParams(2000, 2000, 20.0, 5.0, "normal", "random", bw=0.3,
                         skew=4.0, avg_num_neighbours=1.0,
                         cross_row_similarity=0.0, seed=3)
    csr, f = artificial_matrix_generation(p)
    assert abs(f.nnz_per_row_avg - 20.0) / 20.0 < 0.15
    assert abs(f.bw_scaled_avg - 0.3) / 0.3 < 0.25
    assert abs(f.skew - 4.0) / 4.0 < 0.5
    assert abs(f.num_neighbours_avg - 1.0) < 0.5

    # cross-row similarity target
    p2 = ArtificialParams(2000, 2000, 20.0, 2.0, "normal", "random", bw=0.3,
                          skew=0.0, avg_num_neighbours=0.0,
                          cross_row_similarity=0.7, seed=3)
    _, f2 = artificial_matrix_generation(p2)
    assert f2.cross_row_similarity_avg > 0.45


def test_generator_11_arg_line():
    from spmv_research_tpu.gen import generate_from_line

    # scircuit twin parameters (config.sh twin table format)
    line = "17099 17099 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 scircuit_small"
    csr, f = generate_from_line(line)
    assert csr.m == 17099
    assert f.nnz > 0


def test_mtx_skew_symmetric_sign(tmp_path):
    """Skew-symmetric MTX: mirrored triangle carries a negated sign; storage
    is always expanded so the sign can't be silently dropped (review fix)."""
    path = str(tmp_path / "sk.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real skew-symmetric\n")
        f.write("3 3 2\n2 1 5.0\n3 2 -2.0\n")
    for expand in (True, False):
        coo = mtx_read(path, expand_symmetry=expand)
        dense = coo_to_csr(coo).to_scipy().toarray()
        assert dense[1, 0] == 5.0 and dense[0, 1] == -5.0
        assert dense[2, 1] == -2.0 and dense[1, 2] == 2.0


def test_mtx_array_symmetric(tmp_path):
    """Array-format symmetric files store m(m+1)/2 values (review fix)."""
    path = str(tmp_path / "as.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix array real symmetric\n")
        f.write("3 3\n2.0\n-1.0\n0.5\n3.0\n1.5\n4.0\n")
    coo = mtx_read(path)
    dense = coo_to_csr(coo).to_scipy().toarray()
    np.testing.assert_allclose(dense, dense.T)
    np.testing.assert_allclose(np.diag(dense), [2.0, 3.0, 4.0])
    assert dense[1, 0] == -1.0 and dense[2, 1] == 1.5


def test_fix_diagonal_zeros_symmetric_accounting(rng):
    """fix_diagonal_zeros preserves symmetric nnz_expanded (review fix)."""
    from spmv_research_tpu.convert import csr_drop_upper, fix_diagonal_zeros
    import scipy.sparse as sp

    B = sp.random(40, 40, 0.08, random_state=0)
    A = (B + B.T).tocsr()
    A.sort_indices()
    from spmv_research_tpu.core.host import HostCSR

    low = csr_drop_upper(HostCSR.from_scipy(A))
    fixed = fix_diagonal_zeros(low)
    assert fixed.symmetric_storage
    assert fixed.nnz_expanded == 2 * fixed.nnz - 40


def test_generator_extreme_dedupe():
    """Heavy duplicate cascades converge (review fix: no silent 64-iter cap)."""
    from spmv_research_tpu.gen import ArtificialParams, artificial_matrix_generation

    # huge skew in a tiny window forces long duplicate cascades
    p = ArtificialParams(400, 400, 4.0, 2.0, "normal", "random", bw=0.02,
                         skew=80.0, avg_num_neighbours=1.8,
                         cross_row_similarity=0.9, seed=1)
    csr, _ = artificial_matrix_generation(p)
    for i in range(csr.m):
        seg = csr.ja[csr.ia[i]: csr.ia[i + 1]]
        assert np.all(np.diff(seg) > 0)


def test_create_param_file_lines(tmp_path):
    """Param-file generator (reference create_param_file.py role): the
    footprint formula determines rows, lines drive the generator."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from create_param_file import param_lines
    from spmv_research_tpu.gen import generate_from_line

    files = param_lines(["4-8"], 2, [5.0], [0.3], [0.0], [0.5], [0.25])
    lines = files["4-8"]
    assert len(lines) == 2
    fields = lines[0].split()
    assert len(fields) == 11
    nr_rows, avg = int(fields[0]), float(fields[2])
    size_mb = 4
    assert nr_rows == int((size_mb * (1 << 20) - 4) // (12 * avg + 4))
    host, feats = generate_from_line(lines[0])
    assert host.m == nr_rows
    # realized CSR footprint lands in the requested class (12B/nnz + 4B/row)
    mb = (12 * host.nnz + 4 * (host.m + 1)) / (1 << 20)
    assert 2.0 < mb < 10.0
