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
import functools
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
    a_idx: np.ndarray      # (n_pairs,) index into A.data (HOST arrays:
    b_idx: np.ndarray      # (n_pairs,) index into B.data  D2H over the TPU
    seg: np.ndarray        # (n_pairs,) output slot (sorted) tunnel is ~1MB/s)
    nnz_c: int
    shape: Tuple[int, int]

    def numeric(self, a_data: jnp.ndarray, b_data: jnp.ndarray) -> jnp.ndarray:
        """C values from A/B value arrays (device)."""
        prod = (jnp.take(a_data, jnp.asarray(self.a_idx))
                * jnp.take(b_data, jnp.asarray(self.b_idx)))
        return jax.ops.segment_sum(prod, jnp.asarray(self.seg),
                                   num_segments=self.nnz_c,
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
        a_idx=a_idx[order],
        b_idx=b_idx[order],
        seg=seg,
        nnz_c=nnz_c,
        shape=(A.m, B.n),
    )


# max expanded pairs materialized at once; kept a little under 2^24 so a
# block that overshoots by one row still buckets to a 2^24 pad (one compile)
PAIR_BUDGET = (1 << 24) - (1 << 21)


def _row_blocks_by_pairs(A: HostCSR, B: HostCSR, budget: int):
    """Split A's rows into blocks whose expanded-pair counts fit the
    budget (the round-1 sweep crashed the worker on appu: 132 nnz/row²
    ≈ 245M pairs ≈ 10+ GB of host int64 temporaries).

    Vectorized: block of a row = its pair-offset // budget, so every
    block's pair count is ≤ budget + one row's own count (a single row
    larger than the budget gets a block of its own).
    """
    per_nnz = B.row_lengths()[A.ja].astype(np.int64)
    cps = np.zeros(A.nnz + 1, np.int64)
    np.cumsum(per_nnz, out=cps[1:])
    ia = A.ia.astype(np.int64)
    start_off = cps[ia[:-1]]                 # pairs before each row
    blk = start_off // max(budget, 1)
    change = np.nonzero(np.diff(blk))[0] + 1
    bounds = np.concatenate(([0], change, [A.m]))
    return list(zip(bounds[:-1].tolist(), bounds[1:].tolist()))


def _rows_slice(csr: HostCSR, r0: int, r1: int) -> HostCSR:
    e0, e1 = int(csr.ia[r0]), int(csr.ia[r1])
    return HostCSR(a=csr.a[e0:e1], ja=csr.ja[e0:e1],
                   ia=(csr.ia[r0:r1 + 1] - csr.ia[r0]), m=r1 - r0, n=csr.n)


def _bucket(n: int, floor: int = 1024) -> int:
    return max(1 << int(max(n, 1) - 1).bit_length(), floor)


@dataclasses.dataclass(frozen=True)
class SpGEMMBlockDevice:
    """One row block's device-resident numeric program.

    Built for this TPU's transfer profile (measured round 2): D2H over the
    tunnel is ~1 MB/s and per-pair device gathers of host-built int64 index
    planes dominated the round-1 numeric phase.  Here the A/B operands are
    pre-gathered on host into contiguous pair order, the device iteration is
    elementwise multiply + segmented suffix scan (guard bits, like the SELLR
    lane scan) + one sorted take at segment heads — no scatter, no gather of
    scattered indices, nothing large ever leaves the device."""

    av: jnp.ndarray      # (pad_pairs,) A operand per pair
    bv: jnp.ndarray      # (pad_pairs,) B operand per pair
    guard: jnp.ndarray   # (pad_pairs,) int32 bit k = (pairs to seg end) >= 2^k
    head: jnp.ndarray    # (pad_out,) int32 position of each segment's first pair
    c_ia: np.ndarray
    c_ja: np.ndarray
    nnz_c: int
    npairs: int          # true (unpadded) pair count
    stages: int
    r0: int
    r1: int

    def numeric(self) -> jnp.ndarray:
        return _scan_numeric(self.av, self.bv, self.guard, self.head,
                             stages=self.stages)


@functools.partial(jax.jit, static_argnames=("stages",))
def _scan_numeric(av, bv, guard, head, *, stages):
    prod = av * bv
    for k in range(stages):
        s = 1 << k
        shifted = jnp.concatenate([prod[s:], jnp.zeros(s, prod.dtype)])
        prod = prod + jnp.where((guard >> k) & 1 != 0, shifted, 0.0)
    return prod.at[head].get(mode="promise_in_bounds",
                             indices_are_sorted=True)


def device_plan(plan: SpGEMMPlan, A: HostCSR, B: HostCSR, e0: int,
                dtype=jnp.float32) -> SpGEMMBlockDevice:
    """Lower a symbolic block plan to its device numeric program."""
    dt = np.dtype(dtype)
    npairs = int(plan.a_idx.shape[0])
    pad_pairs = _bucket(npairs)
    pad_out = _bucket(plan.nnz_c)
    a_idx = np.asarray(plan.a_idx)
    b_idx = np.asarray(plan.b_idx)
    seg = np.asarray(plan.seg)
    av = np.zeros(pad_pairs, dt)
    av[:npairs] = A.a[a_idx + e0]
    bv = np.zeros(pad_pairs, dt)
    bv[:npairs] = B.a[b_idx]
    # distance to segment end -> guard bits
    head_pos = np.flatnonzero(np.r_[True, seg[1:] != seg[:-1]])
    ends = np.append(head_pos[1:], npairs)
    seg_len = ends - head_pos
    d_end = (np.repeat(ends, seg_len) - 1
             - np.arange(npairs, dtype=np.int64))
    guard = np.zeros(pad_pairs, np.int32)
    max_seg = int(seg_len.max()) if seg_len.size else 1
    stages = max(int(max_seg - 1).bit_length(), 0)
    for k in range(stages):
        guard[:npairs] |= ((d_end >= (1 << k)).astype(np.int32) << k)
    head = np.zeros(pad_out, np.int32)
    head[: plan.nnz_c] = head_pos.astype(np.int32)
    return SpGEMMBlockDevice(
        av=jnp.asarray(av), bv=jnp.asarray(bv),
        guard=jnp.asarray(guard), head=jnp.asarray(head),
        c_ia=plan.c_ia, c_ja=plan.c_ja, nnz_c=plan.nnz_c,
        npairs=npairs, stages=stages, r0=0, r1=0)


def spgemm_device_plans(A: HostCSR, B: HostCSR, dtype=jnp.float32,
                        pair_budget: int = PAIR_BUDGET):
    """Chunked symbolic+lowering: list of per-block device programs, so
    dense-ish matrices (appu-class) never materialize the full quadratic
    pair expansion on host or device (VERDICT round 1, item 4)."""
    out = []
    for (r0, r1) in _row_blocks_by_pairs(A, B, pair_budget):
        Ablk = _rows_slice(A, r0, r1)
        if Ablk.nnz == 0:
            z32 = jnp.zeros(0, jnp.int32)
            out.append(SpGEMMBlockDevice(
                av=jnp.zeros(0, dtype), bv=jnp.zeros(0, dtype),
                guard=z32, head=z32,
                c_ia=np.zeros(r1 - r0 + 1, INDEX_DTYPE),
                c_ja=np.zeros(0, INDEX_DTYPE), nnz_c=0, npairs=0,
                stages=0, r0=r0, r1=r1))
            continue
        plan = spgemm_symbolic(Ablk, B)
        out.append(dataclasses.replace(
            device_plan(plan, A, B, int(A.ia[r0]), dtype), r0=r0, r1=r1))
    return out


def spgemm(A: HostCSR, B: HostCSR, dtype=jnp.float32,
           pair_budget: int = PAIR_BUDGET) -> HostCSR:
    """C = A·B end-to-end (host CSR out; device numeric per row block).

    Note: pulls all C values to host — fine on the CPU backend and for
    moderate C; the benchmark path (``harness.workloads.bench_spgemm``)
    validates on-device instead because D2H over the TPU tunnel is slow.
    """
    plans = spgemm_device_plans(A, B, dtype, pair_budget)
    c_ia = np.zeros(A.m + 1, np.int64)
    c_ja_l, c_val_l = [], []
    for bp in plans:
        c_ia[bp.r0 + 1: bp.r1 + 1] = c_ia[bp.r0]
        if bp.nnz_c == 0:
            continue
        vals = np.asarray(bp.numeric())[: bp.nnz_c]
        c_val_l.append(vals.astype(np.float64))
        c_ja_l.append(bp.c_ja)
        c_ia[bp.r0 + 1: bp.r1 + 1] = (bp.c_ia[1:].astype(np.int64)
                                      + c_ia[bp.r0])
    return HostCSR(
        a=(np.concatenate(c_val_l) if c_val_l
           else np.zeros(0)),
        ia=c_ia.astype(np.int64 if c_ia[-1] > 2**31 - 1 else INDEX_DTYPE),
        ja=(np.concatenate(c_ja_l) if c_ja_l
            else np.zeros(0, INDEX_DTYPE)),
        m=A.m,
        n=B.n,
    )
