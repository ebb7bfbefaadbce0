"""SpGEMM: sparse × sparse matrix multiply (C = A·B).

Beyond the reference's workloads (its ``bench_spmm.cpp`` is a stub —
``spmm_kernels/csr.cpp:55-67`` empty; SpGEMM is required by BASELINE.json
config #4). TPU-native split:

* **symbolic phase** (host, vectorized numpy): ESC — expand all contribution
  pairs (one per (A(i,j), B(j,k)) product), sort by output coordinate,
  compress to C's CSR structure. Produces static index arrays.
* **numeric phase** (device): per-pair gather–multiply–segment-reduce over the
  precomputed indices; jit/vmap-able, works on any backend. The pair list is
  static per (A,B) structure, so repeated numeric computations (e.g. varying
  values, same pattern) recompile nothing.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.host import HostCSR, INDEX_DTYPE


@dataclasses.dataclass
class SpGEMMPlan:
    """Static expansion plan: C = A·B structure + contribution indices."""

    c_ia: np.ndarray       # (m+1,) C row pointer
    c_ja: np.ndarray       # (nnzC,) C column indices
    a_idx: jnp.ndarray     # (n_pairs,) index into A.data
    b_idx: jnp.ndarray     # (n_pairs,) index into B.data
    seg: jnp.ndarray       # (n_pairs,) output slot per pair (sorted)
    nnz_c: int
    shape: Tuple[int, int]

    def numeric(self, a_data: jnp.ndarray, b_data: jnp.ndarray) -> jnp.ndarray:
        """C values from A/B value arrays (device)."""
        prod = jnp.take(a_data, self.a_idx) * jnp.take(b_data, self.b_idx)
        return jax.ops.segment_sum(prod, self.seg, num_segments=self.nnz_c,
                                   indices_are_sorted=True)


def spgemm_symbolic(A: HostCSR, B: HostCSR) -> SpGEMMPlan:
    if A.n != B.m:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    # expand: pair t = (a-nnz index, b-nnz index within row ja_A[t])
    counts = B.row_lengths()[A.ja]                  # contributions per A nnz
    n_pairs = int(counts.sum())
    a_idx = np.repeat(np.arange(A.nnz, dtype=np.int64), counts)
    # b index ranges: start of B row ja_A[t] for each expanded element
    b_start = B.ia[:-1].astype(np.int64)[A.ja]
    offs = np.arange(n_pairs, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts)
    b_idx = np.repeat(b_start, counts) + offs

    rows_a = np.repeat(np.arange(A.m, dtype=np.int64), A.row_lengths())
    out_row = rows_a[a_idx]
    out_col = B.ja.astype(np.int64)[b_idx]

    key = out_row * B.n + out_col
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    first = np.ones(n_pairs, dtype=bool)
    first[1:] = key_s[1:] != key_s[:-1]
    seg = np.cumsum(first) - 1
    nnz_c = int(seg[-1]) + 1 if n_pairs else 0

    uniq = key_s[first]
    c_row = (uniq // B.n).astype(np.int64)
    c_ja = (uniq % B.n).astype(INDEX_DTYPE)
    c_ia = np.zeros(A.m + 1, dtype=np.int64)
    np.add.at(c_ia, c_row + 1, 1)
    np.cumsum(c_ia, out=c_ia)

    return SpGEMMPlan(
        c_ia=c_ia.astype(INDEX_DTYPE),
        c_ja=c_ja,
        a_idx=jnp.asarray(a_idx[order]),
        b_idx=jnp.asarray(b_idx[order]),
        seg=jnp.asarray(seg),
        nnz_c=nnz_c,
        shape=(A.m, B.n),
    )


def spgemm(A: HostCSR, B: HostCSR, dtype=jnp.float32) -> HostCSR:
    """C = A·B end-to-end (symbolic host + numeric device)."""
    plan = spgemm_symbolic(A, B)
    c_vals = plan.numeric(jnp.asarray(A.a, dtype=dtype),
                          jnp.asarray(B.a, dtype=dtype))
    return HostCSR(
        a=np.asarray(c_vals, dtype=np.float64),
        ia=plan.c_ia,
        ja=plan.c_ja,
        m=A.m,
        n=B.n,
    )
