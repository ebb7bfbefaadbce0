"""DIV packet codec: exact round-trip + footprint accounting."""

import numpy as np
import pytest
import scipy.sparse as sp

from spmv_research_tpu.io.div_codec import compress_csr, decompress


def _roundtrip(mat, packet_nnz=1000):
    mat = mat.tocsr()
    mat.sum_duplicates()
    mat.sort_indices()
    dp = compress_csr(mat.indptr, mat.indices, mat.data,
                      mat.shape[0], mat.shape[1], packet_nnz=packet_nnz)
    ia, ja, a = decompress(dp)
    assert np.array_equal(ia, mat.indptr.astype(ia.dtype))
    assert np.array_equal(ja, mat.indices.astype(ja.dtype))
    assert np.array_equal(a, mat.data)
    return dp


def test_divp_roundtrip_random(rng):
    mat = sp.random(700, 900, 0.01, random_state=5, format="csr")
    dp = _roundtrip(mat)
    # coordinate bit-packing alone beats CSR's 4-byte colind+rowptr
    assert dp.compression_ratio() < 1.0


def test_divp_pattern_matrix_value_rle(rng):
    mat = sp.random(500, 500, 0.02, random_state=3, format="csr")
    mat.data[:] = 1.0   # pattern matrix: value stream collapses to 1 entry
    dp = _roundtrip(mat)
    assert dp.uvals.shape[0] == dp.n_packets      # one distinct value each
    assert dp.compression_ratio() < 0.5


def test_divp_quantized_values(rng):
    mat = sp.random(400, 400, 0.03, random_state=4, format="csr")
    mat.data = rng.choice(np.linspace(-2, 2, 17), mat.nnz)
    dp = _roundtrip(mat, packet_nnz=512)
    assert dp.compression_ratio() < 0.8


def test_divp_edge_cases():
    # empty matrix
    mat = sp.csr_matrix((5, 7))
    _roundtrip(mat)
    # single element
    mat = sp.csr_matrix((np.array([3.5]), (np.array([2]), np.array([6]))),
                        shape=(5, 7))
    _roundtrip(mat)
