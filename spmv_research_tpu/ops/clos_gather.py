"""CLOSG: row-gather + lane-pick front end on the Clos SpMV pipeline.

Replaces the exact-CLOS widen+fill networks (3 kernels + 2 transposes + fill
stages ≈ 70 us at N=2^20) with two cheap steps, exploiting a measured fact:
XLA *row-granular* gather on TPU is HBM-bound (8192×128 rows in ~11 us — it
is element gather that's catastrophic, not row DMA):

  1. slots are laid out in **column-sorted order, padded so every sublane row
     of 128 slots draws from one 128-column block** of x
     (sublane s ↔ x2d row ``rowidx[s]``);
  2. ``wins = x2d[rowidx]`` (XLA row-gather) materializes each sublane's
     x window;
  3. one ``take_along_axis(axis=1)`` lane-pick (per-slot λ = col mod 128 —
     duplication is free, no routing constraints) + multiply by the
     column-sorted value array.

The products then run the exact-Clos perm network (column-sorted → CSR slot
order), the segmented row scan, and the compaction network, unchanged from
``clos.py``. Everything is exactly routable — no spills, no coloring
saturation (unlike the multicast engine ``clos_mcast.py``, which this
supersedes on low-reuse matrices).

Capacity: needs Σ_i ceil(nnz_i/128) ≤ N/128 sublanes, where nnz_i counts
nonzeros with col ∈ [128i, 128(i+1)) — i.e. ~nnz + 64·(n/128) slots.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.host import HostCSR
from .dispatch import register_spmv
from .clos_route import BLK, LANES, SUB, ClosRoutingError, route_clos
from .clos import (LANE2_SHIFT, ROT_SHIFT, SPARE_BITS, SPARE_SHIFT,
                   _pack, _register, _stage_bit, _invreg_xla, _t_fwd, _t_bwd)


@partial(_register,
         data_fields=("rowidx", "lam", "vals_cs",
                      "perm_r1", "perm_r2", "perm_r3",
                      "compact_r1", "compact_r2", "compact_r3",
                      "scan_hi"),
         meta_fields=("shape", "nnz", "nnz_expanded", "N", "V", "x_rows",
                      "scan_stages"))
@dataclasses.dataclass(frozen=True)
class ClosG:
    """Window-gather + Clos SpMV program (packed words as in ``clos.Clos``).

    ``rowidx[s]`` = x2d row feeding sublane s; ``lam`` = per-slot source lane
    (col mod 128) carried in bits [0,7) of an int32 word whose spare bits
    [17,32) hold the scan guards' low stages (the perm_r3 spare bits hold the
    rest... no: scan guards ride ``lam``'s spare bits; ``compact_r3`` carries
    the out-valid bit)."""

    rowidx: jnp.ndarray       # (8V,) int32
    lam: jnp.ndarray          # (8V, 128) int32: bits[0,7) lane; spare unused
    vals_cs: jnp.ndarray      # (8V, 128) values in padded column-sorted order
    perm_r1: jnp.ndarray
    perm_r2: jnp.ndarray
    perm_r3: jnp.ndarray      # spare bits: scan guards (low stages)
    compact_r1: jnp.ndarray
    compact_r2: jnp.ndarray
    compact_r3: jnp.ndarray   # spare bit 0: out-valid
    scan_hi: jnp.ndarray
    shape: Tuple[int, int]
    nnz: int
    nnz_expanded: int
    N: int
    V: int
    x_rows: int
    scan_stages: Tuple[int, ...]

    format_name = "CLOSG"

    @property
    def m(self):
        return self.shape[0]

    @property
    def n(self):
        return self.shape[1]

    def mem_footprint_bytes(self) -> int:
        return (self.N * (self.vals_cs.dtype.itemsize + 7 * 4)
                + self.rowidx.size * 4)


def build_clos_gather(csr: HostCSR, dtype=jnp.float32,
                      max_N: int = 1 << 20) -> ClosG:
    dt = np.dtype(dtype)
    m, n, nnz = csr.m, csr.n, csr.nnz

    lengths = csr.row_lengths()
    rows = np.repeat(np.arange(m, dtype=np.int64), lengths)
    cols = csr.ja.astype(np.int64)

    # --- padded column-sorted layout: sublane-aligned column blocks --------
    css = np.lexsort((rows, cols))          # nnz ids in (col, row) order
    blk_of = cols[css] // LANES             # x2d row of each sorted nnz
    n_blocks = (n + LANES - 1) // LANES
    cnt = np.bincount(blk_of, minlength=n_blocks)
    subl_per_blk = (cnt + LANES - 1) // LANES        # sublanes per block
    subl_per_blk = np.maximum(subl_per_blk, 0)
    sub_start = np.concatenate([[0], np.cumsum(subl_per_blk)])
    S_needed = int(sub_start[-1])

    need = max(nnz, m, S_needed * LANES, 8 * BLK)
    N = 1 << int(need - 1).bit_length()
    if N > max_N:
        raise ClosRoutingError(f"matrix too large for clos-gather (N={N})")
    V = N // BLK
    S = SUB * V

    # slot of sorted-nnz j: block b starts at sublane sub_start[b]
    within = np.arange(nnz) - np.concatenate([[0], np.cumsum(cnt)])[blk_of]
    cs_slot = (sub_start[blk_of] * LANES + within).astype(np.int64)

    rowidx = np.zeros(S, np.int32)
    for_blocks = np.repeat(np.arange(n_blocks), subl_per_blk)
    rowidx[: S_needed] = for_blocks
    lam = np.zeros(N, np.uint32)
    lam[cs_slot] = (cols[css] % LANES).astype(np.uint32)
    vals_cs = np.zeros(N, dtype=dt)
    vals_cs[cs_slot] = csr.a[css].astype(dt)

    # --- perm: padded column-sorted slot -> CSR slot -----------------------
    perm = route_clos(cs_slot, css.astype(np.int64), N)

    # --- scan guards over CSR slot space (as clos.build_clos) --------------
    starts = csr.ia[:-1].astype(np.int64)
    row_start = np.zeros(N, dtype=np.int64)
    row_start[:nnz] = np.repeat(starts, lengths)
    reach_v = np.arange(N, dtype=np.int64) - row_start
    reach_v[nnz:] = 0
    max_reach = int(reach_v[:nnz].max()) if nnz else 0
    scan_guards = np.zeros(N, dtype=np.uint32)
    scan_stages = tuple(range(max_reach.bit_length()))
    for k in scan_stages:
        scan_guards |= ((reach_v >= (1 << k)).astype(np.uint32) << k)

    nonempty = np.nonzero(lengths > 0)[0].astype(np.int64)
    last_slot = (csr.ia[1:].astype(np.int64) - 1)[nonempty]
    compact = route_clos(last_slot, nonempty, N)
    out_valid = np.zeros(N, dtype=np.uint32)
    out_valid[nonempty] = 1

    spare_mask = (1 << SPARE_BITS) - 1
    dummy = np.zeros((SUB, LANES), np.int32)
    scan_hi = (scan_guards >> SPARE_BITS).astype(np.uint32)

    return ClosG(
        rowidx=jnp.asarray(rowidx),
        lam=jnp.asarray(lam.view(np.int32).reshape(S, LANES)),
        vals_cs=jnp.asarray(vals_cs.reshape(S, LANES)),
        perm_r1=jnp.asarray(_pack(perm.r1)),
        perm_r2=jnp.asarray(_pack(perm.r2)),
        perm_r3=jnp.asarray(_pack(perm.r3, scan_guards & spare_mask)),
        compact_r1=jnp.asarray(_pack(compact.r1)),
        compact_r2=jnp.asarray(_pack(compact.r2)),
        compact_r3=jnp.asarray(_pack(compact.r3, out_valid)),
        scan_hi=jnp.asarray(scan_hi.view(np.int32).reshape(S, LANES)
                            if scan_hi.any() else dummy),
        shape=(m, n), nnz=nnz, nnz_expanded=csr.nnz_expanded,
        N=N, V=V, x_rows=int((n + LANES - 1) // LANES),
        scan_stages=scan_stages,
    )


def _windows(A: ClosG, x):
    """wins[s] = x2d[rowidx[s]] via XLA row-gather (HBM-bound, ~11 us/4MB)."""
    n_rows = A.x_rows
    x2d = jnp.pad(x.astype(A.vals_cs.dtype),
                  (0, n_rows * LANES - x.shape[0])).reshape(n_rows, LANES)
    return jnp.take(x2d, A.rowidx, axis=0)


@register_spmv("CLOSG", "xla")
def spmv_closg_xla(A: ClosG, x: jnp.ndarray) -> jnp.ndarray:
    N, V = A.N, A.V
    wins = _windows(A, x)
    v = jnp.take_along_axis(wins, A.lam & 0x7F, axis=1) * A.vals_cs
    v = _invreg_xla(v, A.perm_r1)
    v = _t_fwd(v, V)
    v = _invreg_xla(v, A.perm_r2)
    v = _t_bwd(v, V)
    v = _invreg_xla(v, A.perm_r3)
    for k in A.scan_stages:
        guard = _stage_bit(k, A.perm_r3, A.scan_hi)
        shifted = jnp.roll(v.reshape(-1), 1 << k).reshape(v.shape)
        v = v + jnp.where(guard, shifted, 0.0)
    v = _invreg_xla(v, A.compact_r1)
    v = _t_fwd(v, V)
    v = _invreg_xla(v, A.compact_r2)
    v = _t_bwd(v, V)
    v = _invreg_xla(v, A.compact_r3)
    v = jnp.where(((A.compact_r3 >> SPARE_SHIFT) & 1) != 0, v, 0.0)
    return v.reshape(-1)[: A.m]


# ------------------------------------------------------------------- Pallas

def _gather_mul_kernel(wins_ref, lam_ref, vals_ref, o_ref):
    g = jnp.take_along_axis(wins_ref[:], lam_ref[:] & 0x7F, axis=1)
    o_ref[:] = g * vals_ref[:]


@register_spmv("CLOSG", "pallas")
def spmv_closg_pallas(A: ClosG, x: jnp.ndarray) -> jnp.ndarray:
    from .clos_pallas import (_call, _invreg_kernel, _r3_valid_kernel,
                              _t_fwd as tp_fwd, _t_bwd as tp_bwd)
    from .clos_pallas import _r3_scan_kernel_noval
    N, V = A.N, A.V
    S = SUB * V
    wins = _windows(A, x)
    v = _call(_gather_mul_kernel, wins, A.lam, A.vals_cs)
    v = _call(_invreg_kernel, v, A.perm_r1)
    v = tp_fwd(v, V)
    v = _call(_invreg_kernel, v, A.perm_r2)
    v = tp_bwd(v, V)
    v = _call(partial(_r3_scan_kernel_noval, (S, A.scan_stages)), v,
              A.perm_r3, A.scan_hi)
    v = _call(_invreg_kernel, v, A.compact_r1)
    v = tp_fwd(v, V)
    v = _call(_invreg_kernel, v, A.compact_r2)
    v = tp_bwd(v, V)
    v = _call(_r3_valid_kernel, v, A.compact_r3)
    return v.reshape(-1)[: A.m]


def execute_closg_numpy(A: ClosG, x: np.ndarray) -> np.ndarray:
    """float64-capable host reference of the compiled program."""
    from .clos_route import InVregPlanes, apply_invreg_numpy, ClosPerm
    from .clos_route import apply_clos_numpy

    def unpack(leaf):
        w = np.asarray(leaf).view(np.uint32)
        return InVregPlanes(lane1=(w & 0x7F).astype(np.int64),
                            subrot=((w >> ROT_SHIFT) & 0x7).astype(np.int64),
                            lane2=((w >> LANE2_SHIFT) & 0x7F).astype(np.int64))

    N, V = A.N, A.V
    n_rows = A.x_rows
    x2d = np.zeros((n_rows * LANES,), np.float64)
    x2d[: x.shape[0]] = x
    x2d = x2d.reshape(n_rows, LANES)
    wins = x2d[np.asarray(A.rowidx)]
    lam = np.asarray(A.lam).view(np.uint32) & 0x7F
    w = np.take_along_axis(wins, lam.astype(np.int64), axis=1)
    w = (w * np.asarray(A.vals_cs).astype(np.float64)).reshape(-1)
    w = apply_clos_numpy(w, ClosPerm(V=V, r1=unpack(A.perm_r1),
                                     r2=unpack(A.perm_r2),
                                     r3=unpack(A.perm_r3)))
    sg = (np.asarray(A.perm_r3).view(np.uint32).reshape(-1)
          >> SPARE_SHIFT).astype(np.uint64)
    hi = np.asarray(A.scan_hi).view(np.uint32).reshape(-1)
    if hi.shape[0] == sg.shape[0]:
        sg |= hi.astype(np.uint64) << SPARE_BITS
    for k in A.scan_stages:
        d = 1 << k
        guard = ((sg >> k) & 1) == 1
        sh = np.zeros_like(w)
        sh[d:] = w[:-d]
        w = w + np.where(guard, sh, 0.0)
    w = apply_clos_numpy(w, ClosPerm(V=V, r1=unpack(A.compact_r1),
                                     r2=unpack(A.compact_r2),
                                     r3=unpack(A.compact_r3)))
    valid = (np.asarray(A.compact_r3).view(np.uint32).reshape(-1)
             >> SPARE_SHIFT) & 1
    return (w * valid)[: A.m]
