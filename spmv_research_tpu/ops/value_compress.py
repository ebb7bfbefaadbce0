"""Value-compressed CSR — the reference's value-compression research theme.

The reference's main research direction is value compression
(``Custom_CSR_BV_LUT_x86`` — ``csr_lut_x86.cpp:38-104``: deduplicate values
into a LUT, replace the value array with 1/2/3-byte indices; and the DIV
family — ``DIV/div.cpp``: per-packet value dedup + run lengths + bit-packed
deltas). The payoff is a smaller memory footprint ⇒ higher SpMV throughput on
bandwidth-bound hardware; footprint is reported through the ``mem_footprint``
/ ``mem_ratio`` columns.

Here: :class:`CSRLUT` — dedup-LUT CSR with the narrowest index dtype that
fits the unique-value count (int8/int16/int32, the reference's 1/2/3-byte
choice — ``csr_lut_x86.cpp:102-104``). Values are reconstructed on device by
``lut[idx]``; matrices with few distinct values (patterns, stencils, graded
meshes) drop to 1-2 bytes/nnz of value traffic.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.host import HostCSR, INDEX_DTYPE
from ..core.formats import _register
from .dispatch import register_spmv, register_spmm


@partial(_register,
         data_fields=("lut", "val_idx", "indices", "rows"),
         meta_fields=("shape", "nnz", "nnz_expanded", "n_unique"))
@dataclasses.dataclass(frozen=True)
class CSRLUT:
    """Value-deduplicated CSR."""

    lut: jnp.ndarray      # (n_unique_pad,) distinct values
    val_idx: jnp.ndarray  # (nnz_pad,) int8/int16/int32 index into lut
    indices: jnp.ndarray  # (nnz_pad,) int32 column ids
    rows: jnp.ndarray     # (nnz_pad,) int32 row ids (sorted; pad = m)
    shape: Tuple[int, int]
    nnz: int
    nnz_expanded: int
    n_unique: int

    format_name = "CSR_LUT"

    @property
    def m(self):
        return self.shape[0]

    @property
    def n(self):
        return self.shape[1]

    def mem_footprint_bytes(self) -> int:
        """LUT + narrow value indices + column ids + rowptr (the reference's
        footprint accounting — ``csr_lut_x86.cpp:166``)."""
        return (self.n_unique * self.lut.dtype.itemsize
                + self.nnz * (self.val_idx.dtype.itemsize + 4)
                + (self.m + 1) * 4)


def build_csr_lut(csr: HostCSR, dtype=jnp.float32,
                  nnz_align: int = 1024) -> CSRLUT:
    vals = csr.a.astype(np.dtype(dtype))
    lut, inv = np.unique(vals, return_inverse=True)
    u = lut.size
    if u <= 127:
        idx_dtype = np.int8
    elif u <= 32767:
        idx_dtype = np.int16
    else:
        idx_dtype = np.int32
    nnz_pad = max(((csr.nnz + nnz_align - 1) // nnz_align) * nnz_align,
                  nnz_align)
    # pad lut with a zero so padding slots reconstruct to 0
    lut_pad = np.concatenate([lut, np.zeros(1, lut.dtype)])
    zero_idx = u
    if zero_idx > np.iinfo(idx_dtype).max:
        idx_dtype = np.int32

    vi = np.full(nnz_pad, zero_idx, dtype=idx_dtype)
    vi[: csr.nnz] = inv.astype(idx_dtype)
    cols = np.zeros(nnz_pad, INDEX_DTYPE)
    cols[: csr.nnz] = csr.ja
    rows = np.full(nnz_pad, csr.m, INDEX_DTYPE)
    rows[: csr.nnz] = np.repeat(np.arange(csr.m, dtype=INDEX_DTYPE),
                                csr.row_lengths())
    return CSRLUT(
        lut=jnp.asarray(lut_pad),
        val_idx=jnp.asarray(vi),
        indices=jnp.asarray(cols),
        rows=jnp.asarray(rows),
        shape=(csr.m, csr.n),
        nnz=csr.nnz,
        nnz_expanded=csr.nnz_expanded,
        n_unique=int(u),
    )


@register_spmv("CSR_LUT", "xla")
def spmv_csr_lut(A: CSRLUT, x: jnp.ndarray) -> jnp.ndarray:
    data = jnp.take(A.lut, A.val_idx.astype(jnp.int32))
    prod = data * jnp.take(x, A.indices)
    y = jax.ops.segment_sum(prod, A.rows, num_segments=A.m + 1,
                            indices_are_sorted=True)
    return y[: A.m]


@register_spmm("CSR_LUT", "xla")
def spmm_csr_lut(A: CSRLUT, X: jnp.ndarray) -> jnp.ndarray:
    data = jnp.take(A.lut, A.val_idx.astype(jnp.int32))
    prod = data[:, None] * jnp.take(X, A.indices, axis=0)
    Y = jax.ops.segment_sum(prod, A.rows, num_segments=A.m + 1,
                            indices_are_sorted=True)
    return Y[: A.m]
