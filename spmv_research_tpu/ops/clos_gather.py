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
from .dispatch import register_spmv, register_spmm
from .clos_route import BLK, LANES, SUB, ClosRoutingError, route_clos
from .clos import (LANE2_SHIFT, ROT_SHIFT, SPARE_BITS, SPARE_SHIFT,
                   _pack, _register, _stage_bit, _invreg_xla, _t_fwd, _t_bwd)


@partial(_register,
         data_fields=("rowidx", "vals_cs",
                      "perm_r1", "perm_r2", "perm_r3",
                      "ycand", "ysel", "ysel_w", "wstart", "border",
                      "scan_hi", "gbase", "nbids"),
         meta_fields=("shape", "nnz", "nnz_expanded", "N", "V", "x_rows",
                      "scan_stages", "C", "W", "yext_classes", "use_vlut",
                      "fused_win", "dense_blocks", "scan_cap"))
@dataclasses.dataclass(frozen=True)
class ClosG:
    """Window-gather + Clos SpMV program (packed words as in ``clos.Clos``).

    Front end: ``rowidx[s]`` = x2d row feeding sublane s; the per-slot source
    lane λ = col mod 128 rides in ``perm_r1``'s spare bits [17,24) — the r1
    word is co-located with the column-sorted slot, so one plane read feeds
    both the window lane-pick and the r1 layer (saves a 4 MB λ array on the
    HBM-bound pipeline). Back end (y extraction, replacing a third
    Clos network): each 128-row y group draws its row-end slots from at most
    ``C`` scan-output rows — ``ycand[j·C + c]`` names them; ``ysel`` packs,
    per y slot, the candidate id (bits [7,11)) and the source lane (bits
    [0,7)). ``perm_r3`` spare bits carry the scan guards."""

    rowidx: jnp.ndarray       # (8V,) int32
    vals_cs: jnp.ndarray      # (8V, 128) values in padded column-sorted order
    perm_r1: jnp.ndarray
    perm_r2: jnp.ndarray
    perm_r3: jnp.ndarray      # spare bits: scan guards (low stages)
    ycand: jnp.ndarray        # (m_rows·C,) int32 scan-output row ids
    ysel: jnp.ndarray         # (m_rows, 128) int32: lane | cand<<7
    ysel_w: jnp.ndarray       # (m_rows_pad, 128) int32: lane | cid<<7 | empty<<14
    wstart: jnp.ndarray       # (m_rows_pad,) int32 per-group window start v-row
    border: jnp.ndarray       # (n_batches,) int32 batch ids sorted by class
    scan_hi: jnp.ndarray
    gbase: jnp.ndarray        # (8V/8,) int32 window base (compacted x row)
    nbids: jnp.ndarray        # (n_nonempty,) int32 nonempty x2d block ids
    shape: Tuple[int, int]
    nnz: int
    nnz_expanded: int
    N: int
    V: int
    x_rows: int
    scan_stages: Tuple[int, ...]
    C: int
    W: int                    # max window octaves per group (0 = legacy)
    yext_classes: Tuple[Tuple[int, int, int, int], ...]  # (octaves, base, count, accum)
    use_vlut: bool = False    # values are a 128-entry dict, idx in r1 spare
    fused_win: bool = False   # x windows sliced in-kernel from VMEM x plane
    dense_blocks: bool = True  # nbids is the identity (skip the compaction)
    scan_cap: Tuple[int, ...] = ()  # capped stage set for the pallas scan

    format_name = "CLOSG"

    @property
    def m(self):
        return self.shape[0]

    @property
    def n(self):
        return self.shape[1]

    def mem_footprint_bytes(self) -> int:
        leaves = (self.rowidx, self.vals_cs, self.perm_r1, self.perm_r2,
                  self.perm_r3, self.ysel_w, self.wstart, self.border,
                  self.scan_hi)
        return int(sum(l.size * l.dtype.itemsize for l in leaves))


@partial(_register, data_fields=("chunks",),
         meta_fields=("shape", "nnz", "nnz_expanded", "row_split"))
@dataclasses.dataclass(frozen=True)
class ClosGChunked:
    """Row-chunked CLOSG: one Clos program per ≤2^20-slot row block.

    The radix-1024 Clos construction caps a single program at N = 2^20
    slots (the middle stage needs V ≤ 1024 switches), so larger matrices
    are split into row-contiguous chunks, each compiled independently; the
    dense x is shared (each chunk's window front end reads the same x2d)
    and y is the concatenation of per-chunk outputs."""

    chunks: Tuple[ClosG, ...]
    shape: Tuple[int, int]
    nnz: int
    nnz_expanded: int
    row_split: Tuple[int, ...]   # chunk row boundaries, len = len(chunks)+1

    format_name = "CLOSG"

    @property
    def m(self):
        return self.shape[0]

    @property
    def n(self):
        return self.shape[1]

    def mem_footprint_bytes(self) -> int:
        return int(sum(c.mem_footprint_bytes() for c in self.chunks))


def _rows_slice(csr: HostCSR, r0: int, r1: int) -> HostCSR:
    lo, hi = int(csr.ia[r0]), int(csr.ia[r1])
    return HostCSR(ia=(csr.ia[r0:r1 + 1] - csr.ia[r0]).astype(csr.ia.dtype),
                   ja=csr.ja[lo:hi], a=csr.a[lo:hi],
                   m=r1 - r0, n=csr.n)


def _closg_need(csr: HostCSR, r0: int, r1: int) -> int:
    """Exact slot need of rows [r0, r1) (mirrors build_clos_gather)."""
    lo, hi = int(csr.ia[r0]), int(csr.ia[r1])
    nnz_c = hi - lo
    n_blocks = (csr.n + LANES - 1) // LANES
    cnt = np.bincount(csr.ja[lo:hi] // LANES, minlength=n_blocks)
    s_needed = int(((cnt + LANES - 1) // LANES).sum())
    return max(nnz_c + 1, r1 - r0, s_needed * LANES, 8 * BLK)


SPLIT_ROW_NNZ = 16384    # rows past this break the windowed y extraction


def build_clos_gather_auto(csr: HostCSR, dtype=jnp.float32,
                           max_N: int = 1 << 20, value_lut: bool = False,
                           max_chunks: int = 12, split_rows: bool = True):
    """build_clos_gather with automatic row chunking past the 2^20 cap.

    ``max_chunks`` bounds the fused program size: every chunk contributes
    ~9 pallas kernels to one jitted SpMV, and very large fused programs
    crash the remote TPU worker (observed ≥ ~20M nnz).

    Extreme-skew matrices (a few mega-rows among light ones — webbase/
    ASIC_680k/rajat30 twins) are routed through the long-row split first:
    rows > ``SPLIT_ROW_NNZ`` become ≤-256-nnz sub-rows, which keeps every
    chunk's y extraction in the fast windowed regime (W ≤ 32 octaves) and
    lets a single original row span chunk boundaries. The split is skipped
    for high-average matrices (many uniformly heavy rows): their group
    windows exceed 64 octaves regardless, the legacy candidate-plane back
    end covers them, and a mass split would make the H-row combine
    scatter-bound."""
    if split_rows:
        from .rowsplit import split_long_rows, wrap_row_split, DEFAULT_T
        lengths = csr.row_lengths()
        heavy_n = int((lengths > SPLIT_ROW_NNZ).sum())
        if 0 < heavy_n <= 4096:
            csr2, heavy, seg_ptr = split_long_rows(
                csr, DEFAULT_T, threshold=SPLIT_ROW_NNZ)
            inner = build_clos_gather_auto(csr2, dtype=dtype, max_N=max_N,
                                           value_lut=value_lut,
                                           max_chunks=max_chunks,
                                           split_rows=False)
            return wrap_row_split(inner, (csr.m, csr.n), csr.nnz,
                                  csr.nnz_expanded, heavy, seg_ptr)
    if _closg_need(csr, 0, csr.m) <= max_N:
        return build_clos_gather(csr, dtype=dtype, max_N=max_N,
                                 value_lut=value_lut)
    est_chunks = _closg_need(csr, 0, csr.m) / (0.9 * max_N) + 1
    if est_chunks > max_chunks:
        # XL path: lax.scan over stacked uniform chunk programs — program
        # size constant in the chunk count (the fused path crashes the
        # remote worker past ~12 chunks)
        from .clos_xl import build_clos_gather_xl
        return build_clos_gather_xl(csr, dtype=dtype, chunk_N=max_N)
    splits = [0]
    r0 = 0
    nnz_per_row = max(csr.nnz / max(csr.m, 1), 1e-9)
    while r0 < csr.m:
        r1 = min(csr.m, r0 + max(int(0.8 * max_N / nnz_per_row), 1))
        while _closg_need(csr, r0, r1) > max_N:
            r1 = r0 + max((r1 - r0) * 3 // 4, 1)
        while r1 < csr.m:
            r_try = min(csr.m, r1 + max((r1 - r0) // 8, 1))
            if _closg_need(csr, r0, r_try) > max_N:
                break
            r1 = r_try
        if _closg_need(csr, r0, r1) > max_N:
            raise ClosRoutingError(
                f"rows [{r0},{r1}) exceed a single clos-gather program")
        splits.append(r1)
        r0 = r1
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(2) as _ex:
        chunks = tuple(_ex.map(
            lambda i: build_clos_gather(
                _rows_slice(csr, splits[i], splits[i + 1]),
                dtype=dtype, max_N=max_N, value_lut=value_lut),
            range(len(splits) - 1)))
    return ClosGChunked(chunks=chunks, shape=(csr.m, csr.n), nnz=csr.nnz,
                        nnz_expanded=csr.nnz_expanded,
                        row_split=tuple(splits))


def build_clos_gather(csr: HostCSR, dtype=jnp.float32,
                      max_N: int = 1 << 20, value_lut: bool = False,
                      fuse_windows: bool = False, force_N: int = 0,
                      cap_scan: bool = True, class_pow2: bool = False,
                      host_arrays: bool = False) -> ClosG:
    """``force_N``: pad the program to exactly N=force_N slots (the XL
    scan-over-chunks path needs uniform chunk shapes); ``cap_scan=False``
    disables scan-stage capping (its synthetic extra picks assume the
    chunk's own cap width — XL chunks share one compiled body, so capping
    must be off or uniform); ``class_pow2``: round y-extraction window
    classes up to powers of two so chunks share one canonical class set."""
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

    # nnz+1: slot `nnz` must exist as an always-zero padding slot (empty rows
    # read it during y extraction)
    need = max(nnz + 1, m, S_needed * LANES, 8 * BLK)
    N = 1 << int(need - 1).bit_length()
    if force_N:
        if need > force_N:
            raise ClosRoutingError(
                f"chunk needs {need} slots > forced N={force_N}")
        N = force_N
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

    # --- fused-window front end (v2) ----------------------------------------
    # rowidx is sorted, so after *compacting away empty x2d blocks* every
    # 8-sublane group reads ≤ 8 consecutive compacted-x rows: the kernel
    # slices one (8,128) window per group from the VMEM-resident x plane and
    # resolves each slot with the conflict-free rot-select pick (8 groupwise
    # rolls, each lane-picked per slot, selected by rot = row−base−sublane).
    # This deletes the XLA `wins` materialization — an 8 MB HBM round trip
    # per SpMV on the HBM-bound pipeline. rot (3 bits) rides r1 spare bits
    # [24,27), which the value-LUT codec also wants — the two are exclusive.
    # Measured (v5e, scircuit twin): 7.6 vs 10.2 Gnnz/s unfused — the 8
    # groupwise rolls + per-slot selects cost more VPU time than the ~20 us
    # HBM round trip they save, so the fused front end is OPT-IN
    # (fuse_windows=True), kept for bandwidth-starved future targets.
    nb = np.flatnonzero(subl_per_blk > 0)
    fused_win = (fuse_windows and not value_lut
                 and (nb.size + SUB) * LANES * 4 <= (4 << 20))
    if fused_win:
        rank = np.zeros(n_blocks, np.int64)
        rank[nb] = np.arange(nb.size)
        rowidx_c = np.zeros(S, np.int64)
        rowidx_c[:S_needed] = rank[for_blocks]
        gbase = rowidx_c.reshape(-1, SUB)[:, 0]
        wrot = (rowidx_c - np.repeat(gbase, SUB)
                - (np.arange(S) % SUB)) % SUB
        assert int((rowidx_c - np.repeat(gbase, SUB)).max(initial=0)) < SUB
        lam = lam | (wrot.astype(np.uint32)[np.arange(N) // LANES] << 7)
        dense_blocks = nb.size == n_blocks
        nbids = nb.astype(np.int32)
        gbase = gbase.astype(np.int32)
    else:
        dense_blocks = True
        nbids = np.zeros(1, np.int32)
        gbase = np.zeros(1, np.int32)
    vals_cs = np.zeros(N, dtype=dt)
    vals_cs[cs_slot] = csr.a[css].astype(dt)

    # --- value LUT (DIV / CSR_CV compressed-value role) ---------------------
    # When the matrix has ≤ 128 distinct values (pattern / quantized
    # matrices), the per-slot value is a 7-bit dictionary index riding in
    # perm_r1's remaining spare bits [24,31) and the 4 MB value plane
    # disappears from both the footprint and the HBM-bound pipeline; the
    # kernel pays one extra in-vreg lane-pick from the VMEM-resident dict.
    # Measured (v5e, scircuit pattern twin): footprint 17.5→13.3 MB but
    # runtime +4-8 us (the dict pick costs more than the 4 MB saved), so it
    # is opt-in — a footprint codec, like the reference's CV formats.
    # Reference role: DIV/div.cpp value RLE + csr_cv_block codecs.
    lut = False
    if value_lut:
        uniq = np.unique(vals_cs)            # includes the 0.0 padding value
        if uniq.shape[0] <= LANES:
            lut = True
            vidx = np.searchsorted(uniq, vals_cs).astype(np.uint32)
            lam |= vidx << 7                  # spare payload: lam | vidx<<7
            dict_pad = np.zeros(LANES, dt)
            dict_pad[: uniq.shape[0]] = uniq
            vals_cs = np.broadcast_to(dict_pad, (SUB, LANES)).copy()

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

    # --- y extraction: row-gather of end-slot rows + per-slot select -------
    # empty rows read slot nnz (a padding slot that stays exactly 0)
    end_slot = np.full(m, nnz, np.int64)
    ne = lengths > 0
    end_slot[ne] = csr.ia[1:].astype(np.int64)[ne] - 1
    m_rows = (m + LANES - 1) // LANES
    end_pad = np.full(m_rows * LANES, nnz, np.int64)
    end_pad[:m] = end_slot
    src_row = (end_pad // LANES).reshape(m_rows, LANES)
    ycand_l, cidx = [], np.zeros((m_rows, LANES), np.uint32)
    C = 1
    for j in range(m_rows):
        u, inv = np.unique(src_row[j], return_inverse=True)
        ycand_l.append(u)
        cidx[j] = inv.astype(np.uint32)
        C = max(C, len(u))
    if C > 128:
        raise ClosRoutingError(f"y-extraction candidate count {C} > 128 "
                               "(extreme row-length skew)")
    # stored candidate-major (C, m_rows) so the kernel slices contiguous
    # per-candidate blocks
    ycand = np.zeros((C, m_rows), np.int32)
    for j, u in enumerate(ycand_l):
        ycand[: len(u), j] = u
        ycand[len(u):, j] = u[-1] if len(u) else 0
    ysel = ((end_pad % LANES).astype(np.uint32).reshape(m_rows, LANES)
            | (cidx << 7))  # bits [7,14): candidate id (C <= 128)

    # --- fused pallas extraction: per-group (8w,128) scan-row windows ------
    # end slots are monotone in row, so each y row (= group of 128 matrix
    # rows) draws its end-slot v-rows from a contiguous range of w_g octaves
    # of 8. Groups are processed in batches of 8; batches are sorted into
    # classes by max w_g so the common case (w=1) does one window's work.
    # Empty rows get bit 14 (masked to zero in-kernel) and read no slot.
    m_rows_pad = ((m_rows + SUB - 1) // SUB) * SUB
    n_batches = m_rows_pad // SUB
    src2 = np.zeros((m_rows_pad, LANES), np.int64)
    src2[:m_rows] = (end_pad // LANES).reshape(m_rows, LANES)
    emp2 = np.ones((m_rows_pad, LANES), bool)
    emp2.reshape(-1)[:m] = ~ne
    smin = np.where(emp2, np.int64(S - 1), src2).min(axis=1)
    smax = np.where(emp2, np.int64(0), src2).max(axis=1)
    has = np.logical_not(emp2.all(axis=1))
    smin = np.where(has, smin, 0)
    smax = np.where(has, np.maximum(smax, smin), 0)
    w_g = (smax - smin) // SUB + 1                     # octaves per group
    if class_pow2:      # XL: classes must be uniform across chunks
        w_g = np.power(2, np.ceil(np.log2(np.maximum(w_g, 1)))
                       ).astype(w_g.dtype)
    W = int(w_g.max()) if m_rows_pad else 1
    if W <= 64:            # cid is 9 bits [7,16); high-degree rows ride the
        # same per-group multi-octave loop (W picks per group, paid only by
        # the groups that need it via the class sort)
        wstart = np.minimum(smin, S - SUB * w_g).astype(np.int32)
        cidp = np.clip(src2 - wstart[:, None], 0, SUB * W - 1)
        ysel_w = ((end_pad % LANES).astype(np.uint32)
                  .reshape(m_rows, LANES))
        ysel_w = np.concatenate(
            [ysel_w, np.zeros((m_rows_pad - m_rows, LANES), np.uint32)])
        ysel_w |= (cidp.astype(np.uint32) << 7)
        ysel_w |= (emp2.astype(np.uint32) << 16)
        wb = w_g.reshape(n_batches, SUB).max(axis=1)   # batch class
        border = np.argsort(wb, kind="stable").astype(np.int64)
        counts = np.bincount(wb[border], minlength=65)  # index 1..64
        yext_classes = []
        base = 0
        for c in range(1, 65):
            if counts[c]:
                yext_classes.append((int(c), int(base), int(counts[c]), 0))
                base += int(counts[c])
        border = border | (border << 16)               # (src | dst<<16)
    else:  # extreme skew: fall back to the legacy candidate-plane back end
        W = 0
        wstart = np.zeros(SUB, np.int32)
        ysel_w = np.zeros((SUB, LANES), np.uint32)
        border = np.zeros(1, np.int64)
        yext_classes = []

    # --- scan-stage capping (pallas path only) ------------------------------
    # Guard bits are consulted per stage, so running only stages 0..K-1 turns
    # the segmented scan into in-row *window sums* of width 2^K (Hillis-
    # Steele): slot p holds the sum of its last min(p+1, 2^K) row elements.
    # Row totals for the few rows longer than 2^K are then completed in
    # extraction by summing extra picks at end−c·2^K (each covering one
    # disjoint 2^K-chunk, the earliest the remainder). Extra picks ship as
    # synthetic group records appended to ysel_w/wstart: border packs
    # (src | dst<<16) and extra classes carry accum=1 so the kernel adds
    # into the already-written y rows. The XLA and numpy back ends keep the
    # full scan (capping there would need slow XLA gathers to fix up).
    # Measured motivation: 10 rows >32 nnz forced 9 stages on the scircuit
    # twin; stages cost ~1.4 us each at N=2^20.
    scan_cap = scan_stages
    if cap_scan and W and len(scan_stages) > 4:
        bits_full = len(scan_stages)
        # cost model: one scan stage over (S,128) ~ 9 extra-batch
        # extractions (measured ~1.4 us/stage vs ~0.16 us/batch at N=2^20);
        # e(K) upper-bounds the extra records by one batch per (long row,
        # extra chunk). Ties break toward more capping (smaller K).
        long = lengths[lengths > (1 << 4)].astype(np.int64)
        K = min(range(4, bits_full + 1),
                key=lambda k: 9 * k + int(((long - 1) >> k).sum()))
        if K < bits_full:
            cap = 1 << K
            max_c = int((int(lengths.max()) - 1) // cap)
            len_pad = np.zeros(m_rows_pad * LANES, np.int64)
            len_pad[:m] = lengths
            end2 = np.full(m_rows_pad * LANES, np.int64(nnz))
            end2[:m] = end_slot
            ex_ysel, ex_wstart, ex_border, ex_w = [], [], [], []
            n_syn = n_batches
            for c in range(1, max_c + 1):
                live = len_pad > c * cap
                for b in np.flatnonzero(
                        live.reshape(-1, SUB * LANES).any(axis=1)):
                    sl = slice(b * SUB * LANES, (b + 1) * SUB * LANES)
                    lvg = live[sl].reshape(SUB, LANES)
                    es = (end2[sl] - c * cap).reshape(SUB, LANES)
                    srcg = np.where(lvg, es // LANES, 0)
                    hasg = lvg.any(axis=1)
                    smin_e = np.where(lvg, srcg, np.int64(S - 1)).min(axis=1)
                    smax_e = np.where(lvg, srcg, np.int64(0)).max(axis=1)
                    smin_e = np.where(hasg, smin_e, 0)
                    smax_e = np.where(hasg, np.maximum(smax_e, smin_e), 0)
                    w_e = (smax_e - smin_e) // SUB + 1
                    if int(w_e.max()) > 64:    # can't happen: subset of main
                        raise ClosRoutingError("extra-pick window > 64")
                    ws_e = np.minimum(smin_e, S - SUB * w_e).astype(np.int32)
                    cid_e = np.clip(srcg - ws_e[:, None], 0,
                                    SUB * 64 - 1).astype(np.uint32)
                    sel_e = np.where(
                        lvg, (es % LANES).astype(np.uint32) | (cid_e << 7),
                        np.uint32(1 << 16))
                    ex_ysel.append(sel_e)
                    ex_wstart.append(ws_e)
                    ex_border.append(n_syn | (b << 16))
                    ex_w.append(int(w_e.max()))
                    n_syn += 1
            if ex_border and len(ex_border) <= max(n_batches // 2, 64):
                scan_cap = tuple(range(K))
                ysel_w = np.concatenate([ysel_w] + ex_ysel)
                wstart = np.concatenate(
                    [wstart] + [e.astype(np.int32) for e in ex_wstart])
                order = np.argsort(np.asarray(ex_w), kind="stable")
                eb = np.asarray(ex_border, np.int64)[order]
                ecnt = np.bincount(np.asarray(ex_w)[order], minlength=65)
                base = border.shape[0]
                for cc in range(1, 65):
                    if ecnt[cc]:
                        yext_classes.append((int(cc), int(base),
                                             int(ecnt[cc]), 1))
                        base += int(ecnt[cc])
                border = np.concatenate([border, eb])
    border = border.astype(np.int32)

    spare_mask = (1 << SPARE_BITS) - 1
    dummy = np.zeros((SUB, LANES), np.int32)
    scan_hi = (scan_guards >> SPARE_BITS).astype(np.uint32)

    # XL stacking consumes numpy leaves; skip the per-chunk device put
    conv = np.asarray if host_arrays else jnp.asarray

    return ClosG(
        rowidx=conv(rowidx),
        vals_cs=conv(vals_cs if lut else vals_cs.reshape(S, LANES)),
        perm_r1=conv(_pack(perm.r1, lam)),
        perm_r2=conv(_pack(perm.r2)),
        perm_r3=conv(_pack(perm.r3, scan_guards & spare_mask)),
        ycand=conv(ycand.reshape(-1)),
        ysel=conv(ysel.view(np.int32)),
        ysel_w=conv(ysel_w.view(np.int32)),
        wstart=conv(wstart),
        border=conv(border),
        scan_hi=conv(scan_hi.view(np.int32).reshape(S, LANES)
                     if scan_hi.any() else dummy),
        gbase=conv(gbase), nbids=conv(nbids),
        shape=(m, n), nnz=nnz, nnz_expanded=csr.nnz_expanded,
        N=N, V=V, x_rows=int((n + LANES - 1) // LANES),
        scan_stages=scan_stages, C=C, W=W,
        yext_classes=tuple(yext_classes), use_vlut=lut,
        fused_win=fused_win, dense_blocks=dense_blocks,
        scan_cap=scan_cap,
    )


def _windows(A: ClosG, x):
    """wins[s] = x2d[rowidx[s]] via XLA row-gather (HBM-bound, ~11 us/4MB)."""
    n_rows = A.x_rows
    x2d = jnp.pad(x.astype(A.vals_cs.dtype),
                  (0, n_rows * LANES - x.shape[0])).reshape(n_rows, LANES)
    return x2d.at[A.rowidx].get(mode="promise_in_bounds")


def _extract_y_xla(A: ClosG, v):
    """Row-gather the ≤C candidate scan rows per 128-row y group, lane-pick
    each, select by candidate id."""
    C = A.C
    m_rows = A.ycand.shape[0] // C
    cands = v.at[A.ycand].get(mode="promise_in_bounds").reshape(
        C, m_rows, LANES)
    lam = A.ysel & 0x7F
    cid = (A.ysel >> 7) & 0x7F
    y = jnp.zeros((m_rows, LANES), v.dtype)
    for c in range(C):
        pick = jnp.take_along_axis(cands[c], lam, axis=1)
        y = jnp.where(cid == c, pick, y)
    return y.reshape(-1)[: A.m]


@register_spmv("CLOSG", "xla")
def spmv_closg_xla(A, x: jnp.ndarray) -> jnp.ndarray:
    if isinstance(A, ClosGChunked) and jax.default_backend() not in ("cpu",):
        # the fused multi-chunk XLA program (3x 2^20-slot rolls/transposes/
        # candidate picks in one HLO) reproducibly crashes the remote TPU
        # worker (observed on the mc2depi twin; single-program XLA runs
        # fine). The XLA impl is a correctness reference — use the pallas
        # impl or execute_closg_numpy for chunked formats on TPU.
        raise ValueError("chunked CLOSG xla impl disabled on TPU "
                         "(program too large for the remote worker)")
    if isinstance(A, ClosGChunked):
        return jnp.concatenate([spmv_closg_xla(c, x) for c in A.chunks])
    N, V = A.N, A.V
    wins = _windows(A, x)
    lam = (A.perm_r1 >> SPARE_SHIFT) & 0x7F
    g = jnp.take_along_axis(wins, lam, axis=1)
    if A.use_vlut:
        drow = jnp.broadcast_to(A.vals_cs[0:1, :], lam.shape)
        vals = jnp.take_along_axis(
            drow, (A.perm_r1 >> (SPARE_SHIFT + 7)) & 0x7F, axis=1)
    else:
        vals = A.vals_cs
    v = g * vals
    v = _invreg_xla(v, A.perm_r1)
    v = _t_fwd(v, V)
    v = _invreg_xla(v, A.perm_r2)
    v = _t_bwd(v, V)
    v = _invreg_xla(v, A.perm_r3)
    for k in A.scan_stages:
        guard = _stage_bit(k, A.perm_r3, A.scan_hi)
        shifted = jnp.roll(v.reshape(-1), 1 << k).reshape(v.shape)
        v = v + jnp.where(guard, shifted, 0.0)
    return _extract_y_xla(A, v)


# ------------------------------------------------------------------- Pallas

def _gmul_r1_win_kernel(nG, gbase_ref, p_ref, vals_ref, x_ref, o_ref,
                        win_ref):
    """Fused window + gather + multiply + r1 layer (v2 front end).

    Slices one (8,128) x window per sublane group from the VMEM-resident
    compacted x plane (no HBM wins round trip), then resolves each slot with
    the conflict-free rot-select pick: the per-slot lane index λ is applied
    to *every* groupwise vertical rotation of the window before a per-slot
    select by rot — both indices are consumed per-slot, so (unlike a
    sublane-pick∘lane-pick composition) no two slots can conflict."""
    from .clos_pallas import _invreg_ops
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    i = pl.program_id(0)

    def fill(j, _):
        b = gbase_ref[i * nG + j]
        win_ref[pl.ds(j * SUB, SUB), :] = x_ref[pl.ds(b, SUB), :]
        return 0

    jax.lax.fori_loop(0, nG, fill, 0, unroll=True)
    w = p_ref[:]
    lam = (w >> SPARE_SHIFT) & 0x7F
    rot = (w >> (SPARE_SHIFT + 7)) & 0x7
    wins = win_ref[:]
    R = wins.shape[0]
    s_in_blk = jax.lax.broadcasted_iota(jnp.int32, wins.shape, 0) % SUB
    acc = jnp.where(rot == 0, jnp.take_along_axis(wins, lam, axis=1), 0.0)
    for r in range(1, SUB):
        lo = pltpu.roll(wins, (R - r) % R, 0)
        hi = pltpu.roll(wins, (R - r + SUB) % R, 0)
        rotv = jnp.where(s_in_blk < SUB - r, lo, hi)
        acc = jnp.where(rot == r, jnp.take_along_axis(rotv, lam, axis=1), acc)
    o_ref[:] = _invreg_ops(acc * vals_ref[:], w)


def _gmul_win(A, x):
    """v2 front end: build the compacted VMEM x plane, run the fused kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from .clos_pallas import _STREAM_BLK

    S = SUB * A.V
    xfull = jnp.pad(x.astype(A.vals_cs.dtype),
                    (0, A.x_rows * LANES - x.shape[0])).reshape(
                        A.x_rows, LANES)
    x2c = xfull if A.dense_blocks else xfull.at[A.nbids].get(
        mode="promise_in_bounds")
    x2c = jnp.pad(x2c, ((0, SUB), (0, 0)))   # window overrun guard
    steps = S // _STREAM_BLK if (S % _STREAM_BLK == 0
                                 and S > _STREAM_BLK) else 1
    rows = S // steps
    blk = lambda i: (i, 0)  # noqa: E731
    interpret = jax.default_backend() not in ("tpu",)
    return pl.pallas_call(
        partial(_gmul_r1_win_kernel, rows // SUB),
        out_shape=jax.ShapeDtypeStruct((S, LANES), A.vals_cs.dtype),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, LANES), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec(x2c.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), blk, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, LANES), A.vals_cs.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(A.gbase, A.perm_r1, A.vals_cs, x2c)


def _gmul_r1_dma_kernel(nRows, rowidx_ref, p_ref, vals_ref, x2d_ref,
                        o_ref, win_ref):
    """Gather-mul + r1 with in-kernel window fill: wins[s] = x2d[rowidx[s]]
    as per-sublane (1,128) dynamic slices from the VMEM-resident x plane
    (SELLW's fill pattern — no rot-select, rowidx is per-sublane free).
    Deletes the XLA wins round trip (~8 MB at N=2^20) from the HBM-bound
    front half; applicable when the x plane fits VMEM (n ≤ 2^20)."""
    from jax.experimental import pallas as pl
    from .clos_pallas import _invreg_ops
    i = pl.program_id(0)

    def fill(j, _):
        r = rowidx_ref[i * nRows + j]
        win_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(r, 1), :]
        return 0

    jax.lax.fori_loop(0, nRows, fill, 0, unroll=True)
    w = p_ref[:]
    g = jnp.take_along_axis(win_ref[:], (w >> SPARE_SHIFT) & 0x7F, axis=1)
    o_ref[:] = _invreg_ops(g * vals_ref[:], w)


def _gmul_dma(A, x):
    """DMA-fill front end: x plane VMEM-resident, windows filled in-kernel.

    Block = 512 sublane rows per grid step (SELLW's proven fill size —
    the fill loop is fully unrolled, and 1024 unrolled DMAs per step
    crashed the remote worker's compiler)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _DMA_BLK = 512
    S = SUB * A.V
    x2d = jnp.pad(x.astype(A.vals_cs.dtype),
                  (0, A.x_rows * LANES - x.shape[0])).reshape(
                      A.x_rows, LANES)
    steps = S // _DMA_BLK if (S % _DMA_BLK == 0 and S > _DMA_BLK) else 1
    rows = S // steps
    blk = lambda i: (i, 0)  # noqa: E731
    interpret = jax.default_backend() not in ("tpu",)
    return pl.pallas_call(
        partial(_gmul_r1_dma_kernel, rows),
        out_shape=jax.ShapeDtypeStruct((S, LANES), A.vals_cs.dtype),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, LANES), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, LANES), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((A.x_rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), blk, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, LANES), A.vals_cs.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(A.rowidx, A.perm_r1, A.vals_cs, x2d)


def _gmul_r1_kernel(lut, wins_ref, p_ref, vals_ref, o_ref):
    """Window lane-pick (λ in r1 spare bits) + value multiply + r1 layer,
    fused: one kernel instead of two saves an 8 MB v round-trip plus the
    4 MB λ plane on the HBM-bound pipeline. In LUT mode the value is one
    more lane-pick from the 128-entry dict (vals_ref row 0), its 7-bit index
    riding bits [24,31) of the r1 word — no value plane at all."""
    from .clos_pallas import _invreg_ops
    w = p_ref[:]
    g = jnp.take_along_axis(wins_ref[:], (w >> SPARE_SHIFT) & 0x7F, axis=1)
    if lut:
        drow = jnp.broadcast_to(vals_ref[0:1, :], w.shape)
        val = jnp.take_along_axis(drow, (w >> (SPARE_SHIFT + 7)) & 0x7F,
                                  axis=1)
    else:
        val = vals_ref[:]
    o_ref[:] = _invreg_ops(g * val, w)


def _extract_y_kernel(meta, cands_ref, ysel_ref, o_ref):
    """cands (C·m_rows, 128) candidate-major stacked rows; picks + selects."""
    C, m_rows = meta
    sel = ysel_ref[:]
    lam = sel & 0x7F
    cid = (sel >> 7) & 0x7F
    y = jnp.zeros(sel.shape, o_ref.dtype)
    for c in range(C):
        block = cands_ref[c * m_rows:(c + 1) * m_rows, :]
        pick = jnp.take_along_axis(block, lam, axis=1)
        y = jnp.where(cid == c, pick, y)
    o_ref[:] = y


@register_spmv("CLOSG", "pallas")
def spmv_closg_pallas(A, x: jnp.ndarray) -> jnp.ndarray:
    if isinstance(A, ClosGChunked):
        return jnp.concatenate([spmv_closg_pallas(c, x) for c in A.chunks])
    from .clos_pallas import (_call, _call_gridded, _invreg_kernel,
                              _t_fwd as tp_fwd, _t_bwd as tp_bwd)
    from .clos_pallas import _r3_scan_kernel_noval, _r3_scan_yext_kernel
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, V = A.N, A.V
    S = SUB * V
    if A.fused_win:
        v = _gmul_win(A, x)
    elif (not A.use_vlut and A.x_rows * LANES * A.vals_cs.dtype.itemsize
          <= (4 << 20)):
        v = _gmul_dma(A, x)    # x plane fits VMEM: fill windows in-kernel
    else:
        wins = _windows(A, x)
        v = _call_gridded(partial(_gmul_r1_kernel, A.use_vlut), wins,
                          A.perm_r1, A.vals_cs) if not A.use_vlut else _call(
            partial(_gmul_r1_kernel, A.use_vlut), wins, A.perm_r1, A.vals_cs)
    v = tp_fwd(v, V)
    v = _call_gridded(_invreg_kernel, v, A.perm_r2)
    v = tp_bwd(v, V)
    interpret = jax.default_backend() not in ("tpu",)
    if A.W:
        m_rows_pad = A.ysel_w.shape[0]
        y = pl.pallas_call(
            partial(_r3_scan_yext_kernel,
                    (S, A.scan_cap or A.scan_stages, A.yext_classes)),
            out_shape=jax.ShapeDtypeStruct((m_rows_pad, LANES), v.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((S, LANES), v.dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(v, A.perm_r3, A.scan_hi, A.ysel_w, A.wstart, A.border)
        return y.reshape(-1)[: A.m]
    v = _call(partial(_r3_scan_kernel_noval, (S, A.scan_stages)), v,
              A.perm_r3, A.scan_hi)
    C = A.C
    m_rows = A.ycand.shape[0] // C
    cands = v.at[A.ycand].get(mode="promise_in_bounds")
    y = pl.pallas_call(
        partial(_extract_y_kernel, (C, m_rows)),
        out_shape=jax.ShapeDtypeStruct((m_rows, LANES), v.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cands, A.ysel)
    return y.reshape(-1)[: A.m]


def execute_closg_numpy(A, x: np.ndarray) -> np.ndarray:
    """float64-capable host reference of the compiled program."""
    if isinstance(A, ClosGChunked):
        return np.concatenate([execute_closg_numpy(c, x) for c in A.chunks])
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
    r1w = np.asarray(A.perm_r1).view(np.uint32)
    lam = (r1w >> SPARE_SHIFT) & 0x7F
    w = np.take_along_axis(wins, lam.astype(np.int64), axis=1)
    if A.use_vlut:
        drow = np.asarray(A.vals_cs)[0].astype(np.float64)
        vals = drow[((r1w >> (SPARE_SHIFT + 7)) & 0x7F).astype(np.int64)]
    else:
        vals = np.asarray(A.vals_cs).astype(np.float64)
    w = (w * vals).reshape(-1)
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
    C = A.C
    w2 = w.reshape(-1, LANES)
    m_rows = np.asarray(A.ycand).shape[0] // C
    cands = w2[np.asarray(A.ycand)].reshape(C, m_rows, LANES)
    sel = np.asarray(A.ysel).view(np.uint32)
    lam_y = (sel & 0x7F).astype(np.int64)
    cid = (sel >> 7) & 0x7F
    y = np.zeros((m_rows, LANES))
    for c in range(C):
        pick = np.take_along_axis(cands[c], lam_y, axis=1)
        y = np.where(cid == c, pick, y)
    return y.reshape(-1)[: A.m]


# ------------------------------------------------------------------- SpMM

def _spmm_scan(A, X: jnp.ndarray, impl: str) -> jnp.ndarray:
    """Y = A @ X as a ``lax.scan`` over X's columns: the SpMV pipeline
    compiles ONCE regardless of K (an unrolled K-loop of chunked-CLOSG
    programs crashes the remote TPU worker past ~12 fused chunks; the scan
    keeps the program at one chunk set). Reference role: bench_spmm.cpp
    K_DIM sweep (``config.sh:138-143``)."""
    from . import dispatch

    def body(_, xk):
        return 0, dispatch.spmv(A, xk, impl=impl)

    _, ys = jax.lax.scan(body, 0, jnp.transpose(X))
    return jnp.transpose(ys)


@register_spmm("CLOSG", "xla")
def spmm_closg_xla(A, X: jnp.ndarray) -> jnp.ndarray:
    return _spmm_scan(A, X, "xla")


@register_spmm("CLOSG", "pallas")
def spmm_closg_pallas(A, X: jnp.ndarray) -> jnp.ndarray:
    return _spmm_scan(A, X, "pallas")
