"""CLOS device format: the radix-1024 routed SpMV engine.

Same pipeline as BFLY (``routing.py:200-248`` docstring — widen / fill / perm
/ multiply / scan / compact), but each of the three permutation networks is a
5-stage Clos program (``clos_route.py``) instead of a ~39-stage Beneš network:
9 vreg-shuffle planes + 2 transposes per network. No position spreads are
needed (Clos routes any injection in the same 5 stages): x enters at slots
[0, n) and y exits at slots [0, m).

Reference role: flagship unstructured-SpMV kernel — the analog of the
reference's main research format (``DIV/div.cpp``) in the sense of "the
format you compile a matrix into for the fastest general SpMV".
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
from .clos_route import (BLK, LANES, SUB, ClosPerm, ClosRoutingError,
                         route_clos, apply_clos_numpy)


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(cls, data_fields=list(data_fields),
                                     meta_fields=list(meta_fields))
    return cls


LANE1_SHIFT, ROT_SHIFT, LANE2_SHIFT, SPARE_SHIFT = 0, 7, 10, 17
SPARE_BITS = 32 - SPARE_SHIFT  # 15


@partial(_register,
         data_fields=("widen_r1", "widen_r2", "widen_r3",
                      "perm_r1", "perm_r2", "perm_r3",
                      "compact_r1", "compact_r2", "compact_r3",
                      "fill_hi", "vals", "scan_hi"),
         meta_fields=("shape", "nnz", "nnz_expanded", "N", "V",
                      "fill_stages", "scan_stages"))
@dataclasses.dataclass(frozen=True)
class Clos:
    """Compiled Clos routing program on device.

    Each ``*_r*`` leaf packs the 3 in-vreg shuffle planes of one layer into a
    single int32 word per slot: bits [0,7) lane1, [7,10) sublane rotation,
    [10,17) lane2 — extracted in-kernel with shift+mask (packing avoids the
    expensive int8→int32 vreg relayout a separate-plane encoding would pay).
    ``*_r{1,3}`` are (8V, 128); ``*_r2`` is (8·1024, V/8) (the middle layer
    operates on the transposed array).

    The 15 spare bits [17,32) carry the stage bits of whatever follows the
    layer: ``widen_r3`` carries fill-take bits (stage k at bit 17+k),
    ``perm_r3`` carries scan guards, ``compact_r3`` carries the out-valid
    bit. Fill/scan stages beyond 15 overflow into ``fill_hi``/``scan_hi``
    ((8V,128) int32, bit k-15 for stage k; all-zero (8,128) dummies when
    unused).
    """

    widen_r1: jnp.ndarray
    widen_r2: jnp.ndarray
    widen_r3: jnp.ndarray
    perm_r1: jnp.ndarray
    perm_r2: jnp.ndarray
    perm_r3: jnp.ndarray
    compact_r1: jnp.ndarray
    compact_r2: jnp.ndarray
    compact_r3: jnp.ndarray
    fill_hi: jnp.ndarray
    vals: jnp.ndarray         # (8V, 128) values in CSR slot order
    scan_hi: jnp.ndarray
    shape: Tuple[int, int]
    nnz: int
    nnz_expanded: int
    N: int
    V: int
    fill_stages: Tuple[int, ...]
    scan_stages: Tuple[int, ...]

    format_name = "CLOS"

    @property
    def m(self):
        return self.shape[0]

    @property
    def n(self):
        return self.shape[1]

    def mem_footprint_bytes(self) -> int:
        words = 9 * 4  # one packed int32 word plane per layer, 9 layers
        extra = (self.fill_hi.size + self.scan_hi.size) * 4
        return self.N * (self.vals.dtype.itemsize + words) + extra


def _pack(p, spare: np.ndarray | None = None) -> np.ndarray:
    """Pack one layer's planes (+optional spare-bit payload) into int32."""
    w = (p.lane1.astype(np.uint32)
         | (p.subrot.astype(np.uint32) << ROT_SHIFT)
         | (p.lane2.astype(np.uint32) << LANE2_SHIFT))
    if spare is not None:
        w |= spare.reshape(w.shape).astype(np.uint32) << SPARE_SHIFT
    return w.view(np.int32)


def build_clos(csr: HostCSR, dtype=jnp.float32, max_N: int = 1 << 20) -> Clos:
    """Compile host CSR into a Clos routing program (cacheable)."""
    dt = np.dtype(dtype)
    m, n, nnz = csr.m, csr.n, csr.nnz
    need = max(nnz, n, m, 8 * BLK)
    N = 1 << int(need - 1).bit_length()
    if N > max_N:
        raise ClosRoutingError(f"matrix too large for single-block clos (N={N})")
    V = N // BLK

    lengths = csr.row_lengths()
    rows = np.repeat(np.arange(m, dtype=np.int64), lengths)
    cols = csr.ja.astype(np.int64)

    # column-sorted slot space (as routing.py:272-296)
    css = np.lexsort((rows, cols))
    cols_css = cols[css]
    first = np.ones(nnz, dtype=bool)
    first[1:] = cols_css[1:] != cols_css[:-1]
    run_start_idx = np.nonzero(first)[0]
    distinct_cols = cols_css[run_start_idx]

    widen = route_clos(distinct_cols, run_start_idx, N)

    run_start_of = np.zeros(N, dtype=np.int64)
    run_start_of[:nnz] = run_start_idx[np.cumsum(first) - 1]
    reach_f = np.arange(N, dtype=np.int64) - run_start_of
    reach_f[nnz:] = 0
    fill_words = np.zeros(N, np.uint32)
    fill_stages = []
    max_rf = int(reach_f[:nnz].max()) if nnz else 0
    for k in range(max_rf.bit_length()):
        hsb = (reach_f > 0) & ((reach_f >> k) == 1)
        if hsb.any():
            fill_words |= hsb.astype(np.uint32) << k
            fill_stages.append(k)

    perm = route_clos(np.arange(nnz, dtype=np.int64), css.astype(np.int64), N)

    vals = np.zeros(N, dtype=dt)
    vals[:nnz] = csr.a.astype(dt)
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
    fill_hi = (fill_words >> SPARE_BITS).astype(np.uint32)
    scan_hi = (scan_guards >> SPARE_BITS).astype(np.uint32)

    return Clos(
        widen_r1=jnp.asarray(_pack(widen.r1)),
        widen_r2=jnp.asarray(_pack(widen.r2)),
        widen_r3=jnp.asarray(_pack(widen.r3, fill_words & spare_mask)),
        perm_r1=jnp.asarray(_pack(perm.r1)),
        perm_r2=jnp.asarray(_pack(perm.r2)),
        perm_r3=jnp.asarray(_pack(perm.r3, scan_guards & spare_mask)),
        compact_r1=jnp.asarray(_pack(compact.r1)),
        compact_r2=jnp.asarray(_pack(compact.r2)),
        compact_r3=jnp.asarray(_pack(compact.r3, out_valid)),
        fill_hi=jnp.asarray(fill_hi.view(np.int32).reshape(SUB * V, LANES)
                            if fill_hi.any() else dummy),
        vals=jnp.asarray(vals.reshape(SUB * V, LANES)),
        scan_hi=jnp.asarray(scan_hi.view(np.int32).reshape(SUB * V, LANES)
                            if scan_hi.any() else dummy),
        shape=(m, n), nnz=nnz, nnz_expanded=csr.nnz_expanded,
        N=N, V=V,
        fill_stages=tuple(fill_stages), scan_stages=scan_stages,
    )


# --------------------------------------------------------------------- XLA

def _invreg_xla(v, word):
    """One in-vreg layer on a (S, W) array (packed-word planes)."""
    S, W = v.shape
    l1 = word & 0x7F
    rot = (word >> ROT_SHIFT) & 0x7
    l2 = (word >> LANE2_SHIFT) & 0x7F
    t1 = jnp.take_along_axis(v, l1, axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, W), 0)
    src = rows // SUB * SUB + (rows % SUB + rot) % SUB
    t2 = jnp.take_along_axis(t1, src, axis=0)
    return jnp.take_along_axis(t2, l2, axis=1)


def _t_fwd(v, V):
    """(8V, 128) slot layout -> transposed (8·1024, V/8) layout."""
    return v.reshape(V, BLK).T.reshape(SUB * BLK, V // SUB)


def _t_bwd(v, V):
    return v.reshape(BLK, V).T.reshape(SUB * V, LANES)


def _net_xla(v, r1, r2, r3, V):
    v = _invreg_xla(v, r1)
    v = _t_fwd(v, V)
    v = _invreg_xla(v, r2)
    v = _t_bwd(v, V)
    return _invreg_xla(v, r3)


def _stage_bit(k, lo_word, hi):
    """Take/guard bit of stage k from the spare bits of lo_word or the
    overflow plane (returns a boolean array or None if out of range)."""
    if k < SPARE_BITS:
        return ((lo_word >> (SPARE_SHIFT + k)) & 1) != 0
    return ((hi >> (k - SPARE_BITS)) & 1) != 0


@register_spmv("CLOS", "xla")
def spmv_clos_xla(A: Clos, x: jnp.ndarray) -> jnp.ndarray:
    N, V = A.N, A.V
    v = jnp.pad(x.astype(A.vals.dtype), (0, N - x.shape[0]))
    v = v.reshape(SUB * V, LANES)
    v = _net_xla(v, A.widen_r1, A.widen_r2, A.widen_r3, V)
    for k in A.fill_stages:
        take = _stage_bit(k, A.widen_r3, A.fill_hi)
        shifted = jnp.roll(v.reshape(-1), 1 << k).reshape(v.shape)
        v = jnp.where(take, shifted, v)
    v = _net_xla(v, A.perm_r1, A.perm_r2, A.perm_r3, V)
    v = v * A.vals
    for k in A.scan_stages:
        guard = _stage_bit(k, A.perm_r3, A.scan_hi)
        shifted = jnp.roll(v.reshape(-1), 1 << k).reshape(v.shape)
        v = v + jnp.where(guard, shifted, 0.0)
    v = _net_xla(v, A.compact_r1, A.compact_r2, A.compact_r3, V)
    v = jnp.where(((A.compact_r3 >> SPARE_SHIFT) & 1) != 0, v, 0.0)
    return v.reshape(-1)[: A.m]


def execute_clos_numpy(A: Clos, x: np.ndarray) -> np.ndarray:
    """float64-capable host reference of the compiled program."""
    from .clos_route import InVregPlanes

    def unpack(leaf):
        w = np.asarray(leaf).view(np.uint32)
        return InVregPlanes(lane1=(w & 0x7F).astype(np.int64),
                            subrot=((w >> ROT_SHIFT) & 0x7).astype(np.int64),
                            lane2=((w >> LANE2_SHIFT) & 0x7F).astype(np.int64))

    def spare(leaf, hi_leaf):
        lo = np.asarray(leaf).view(np.uint32).reshape(-1) >> SPARE_SHIFT
        hi = np.asarray(hi_leaf).view(np.uint32).reshape(-1)
        out = lo.astype(np.uint64)
        if hi.shape[0] == lo.shape[0]:
            out |= hi.astype(np.uint64) << SPARE_BITS
        return out

    N, V = A.N, A.V
    v = np.zeros(N, np.float64)
    v[: x.shape[0]] = x
    w = apply_clos_numpy(v, ClosPerm(V=V, r1=unpack(A.widen_r1),
                                     r2=unpack(A.widen_r2),
                                     r3=unpack(A.widen_r3)))
    fw = spare(A.widen_r3, A.fill_hi)
    for k in A.fill_stages:
        d = 1 << k
        take = ((fw >> k) & 1) == 1
        sh = np.zeros_like(w)
        sh[d:] = w[:-d]
        w = np.where(take, sh, w)
    w = apply_clos_numpy(w, ClosPerm(V=V, r1=unpack(A.perm_r1),
                                     r2=unpack(A.perm_r2),
                                     r3=unpack(A.perm_r3)))
    w = w * np.asarray(A.vals).reshape(-1).astype(np.float64)
    sg = spare(A.perm_r3, A.scan_hi)
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
