"""SELLR: group-pure sublane-bound SpMV — one fused kernel, y resident in VMEM.

Third-generation locality engine (successor to SELLW, ``sellw.py``): the
reference role is still the SELL-C-σ / column-locality format family
(``benchmark_code/BENCH/src/spmv_kernels/sell_sorted.cpp``,
``spv8.cpp:243-299``), rebuilt around three measured facts of this TPU
(tools/sellr_spike*.py):

* the Pallas grid DMA streams 8 B/slot at 700–800 GB/s — speed of light —
  when the kernel has no serialized scatter;
* the per-chunk dynamic read-modify-write y-scatter of SELLW-style designs
  costs half the kernel time;
* slots/nnz (packing density) multiplies directly into Gnnz/s: SELLW's
  G=2 block grouping wastes 2–4× in sublane slack.

Layout
------
Rows are cut into **groups** of 1024 (= 8 y2d rows of 128 lanes).  Within a
group, nnz are binned by x2d row (``col >> 7``); a bin's *parts* (maximal
(row, x2d-row) runs, split at 128) are packed into **sublane lists** of 128
slots bound to that x2d row.  Chunks = 8 sublane lists of one group (group-
pure).  Density: one bin per (group, x2d row) — slack only at each bin's
last sublane, ~1.05–1.2 slots/nnz on banded matrices.

Per-slot word (int32):
  [0,7)    lane pick  (col & 127)
  [7,14)   scan guard bits (stage k at bit 7+k; part pos d: bit k = d≥2^k)
  [14,21)  eidx — the *source* lane of this target's part end, stored at the
           target lane (row & 127) of the part's own sublane
  [21]     emask — live part end at this (sublane, lane)
  [22,25)  roll r   = (tsrow - sublane) mod 8   (tsrow = (row>>7) & 7)
  [25]     wrap     = sublane + r >= 8

Kernel (one grid step = NB chunks)
----------------------------------
fill wins (per-sublane (1,128) x2d slices) → lane-pick gather → multiply →
segmented lane scan → eidx pick → emask → masked sublane rolls place each
part sum at (tsrow, row&127) of its chunk plane → sequential run-flush:
chunks of one group accumulate into an (8,128) scratch, flushed into the
VMEM-resident y plane (the kernel *output*, constant index_map) once per
group.  y is written to HBM exactly once, at the end.

Applicability: column locality (banded / post-RCM / generated diagonal).
The builder raises :class:`SellRBuildError` for scattered matrices
(estimated slots/nnz too high) — those route to CLOSG.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.host import HostCSR
from .dispatch import register_spmv, register_spmm
from .clos import _register
from .clos_route import LANES, SUB

GROUP = SUB * LANES          # 1024 rows per group
NB = 64                      # chunks per grid step
SMEM_BLK = 1024              # int32 SMEM tile (XLA layout T(1024))
_MAX_STAGES = 7
_XY_VMEM_ROWS = 1 << 14      # x2d/y2d rows each ≤ 16384 (8 MB fp32) resident


class SellRBuildError(ValueError):
    pass


@partial(_register, data_fields=("word", "vals", "smeta"),
         meta_fields=("shape", "nnz", "nnz_expanded", "nchunks", "x_rows",
                      "y_rows", "stages", "rolls"))
@dataclasses.dataclass(frozen=True)
class SellR:
    word: jnp.ndarray    # (8·nch_pad, 128) int32 packed per-slot word
    vals: jnp.ndarray    # (8·nch_pad, 128) fp32 values (0 in padding)
    smeta: jnp.ndarray   # (nsteps·1024,) int32: per step, [0,512) wrow per
                         # sublane; [512,576) per-chunk (ybase<<1 | flush)
    shape: Tuple[int, int]
    nnz: int
    nnz_expanded: int
    nchunks: int         # live chunks
    x_rows: int          # x2d rows (≥ 1)
    y_rows: int          # y2d rows incl. pad to multiple of 8
    stages: int          # segmented-scan stages
    rolls: Tuple[Tuple[int, int], ...]  # static (r, wrap) roll set, r>0

    format_name = "SELLR"

    @property
    def m(self):
        return self.shape[0]

    @property
    def n(self):
        return self.shape[1]

    def mem_footprint_bytes(self) -> int:
        return int(self.word.size * 4
                   + self.vals.size * self.vals.dtype.itemsize
                   + self.smeta.size * 4)


def _guard_bits(k: int) -> np.ndarray:
    d = np.arange(k, dtype=np.uint32)
    g = np.zeros(k, np.uint32)
    for kk in range(_MAX_STAGES):
        g |= ((d >= (1 << kk)).astype(np.uint32) << kk)
    return g


def build_sellr(csr: HostCSR, dtype=jnp.float32,
                max_slot_factor: float = 3.0) -> SellR:
    """Compile host CSR into a SELLR program.

    Raises :class:`SellRBuildError` when the matrix has no column locality
    (estimated slots/nnz > ``max_slot_factor``) or exceeds the VMEM
    residency limits for x/y.
    """
    dt = np.dtype(dtype)
    m, n, nnz = csr.m, csr.n, csr.nnz
    if m == 0 or nnz == 0:
        raise SellRBuildError("empty matrix")
    x_rows = max((n + LANES - 1) // LANES, 1)
    ngroups = (m + GROUP - 1) // GROUP
    y_rows = ngroups * SUB
    if x_rows > _XY_VMEM_ROWS or y_rows > _XY_VMEM_ROWS:
        raise SellRBuildError(
            f"x_rows={x_rows} / y_rows={y_rows} exceed VMEM residency "
            f"limit {_XY_VMEM_ROWS}")
    ia = csr.ia.astype(np.int64)
    ja = csr.ja.astype(np.int64)

    # fast suitability precheck (sampled): slots/group ≈ Σ_bins
    # (binlen + 64): scattered matrices degenerate to ~128 slots/nnz.
    est_slots = est_nnz = 0
    for g in range(0, ngroups, max(ngroups // 64, 1)):
        e0 = int(ia[g * GROUP])
        e1 = int(ia[min((g + 1) * GROUP, m)])
        if e0 == e1:
            continue
        xr, cnt = np.unique(ja[e0:e1] // LANES, return_counts=True)
        est_slots += int(np.ceil(cnt / LANES).sum()) * LANES
        est_nnz += e1 - e0
    if est_nnz and est_slots > max_slot_factor * est_nnz:
        raise SellRBuildError(
            f"estimated {est_slots / est_nnz:.1f} slots/nnz "
            "(no column locality — not a SELLR matrix)")

    gb_cache = {k: _guard_bits(k) for k in range(1, LANES + 1)}
    word_l, vals_l, wrow_l = [], [], []       # per sublane (128,) arrays
    chunk_of = []                             # per chunk: group id
    chunk_smax_l = []                         # per chunk: scan stages needed
    max_part = 1

    a32 = csr.a.astype(dt)
    for g in range(ngroups):
        r0, r1 = g * GROUP, min((g + 1) * GROUP, m)
        e0, e1 = int(ia[r0]), int(ia[r1])
        if e0 == e1:
            continue
        cols = ja[e0:e1]
        vals_b = a32[e0:e1]
        lens = (ia[r0 + 1:r1 + 1] - ia[r0:r1]).astype(np.int64)
        rowl = np.repeat(np.arange(r1 - r0, dtype=np.int64), lens)
        xrow = cols >> 7
        lane = (cols & 127).astype(np.uint32)
        # parts: maximal runs of (rowl, xrow), split at 128
        brk = np.flatnonzero(np.r_[True, (np.diff(rowl) != 0)
                                   | (np.diff(xrow) != 0)])
        pstart = brk
        pend = np.append(brk[1:], cols.size)
        plen = pend - pstart
        # split long parts
        if plen.max(initial=0) > LANES:
            ps, pe = [], []
            for s, e in zip(pstart, pend):
                while e - s > LANES:
                    ps.append(s)
                    pe.append(s + LANES)
                    s += LANES
                ps.append(s)
                pe.append(e)
            pstart = np.array(ps, np.int64)
            pend = np.array(pe, np.int64)
            plen = pend - pstart
        # bin by xrow; within bin by target sublane (tsrow) so sublane
        # lists come out tsrow-pure (dist 0 after modal assignment), then
        # longest-first
        order = np.lexsort((-plen, rowl[pstart] >> 7, xrow[pstart]))
        # allocator state: per open sublane of current bin
        sub_words, sub_vals, sub_wrow = [], [], []   # this group's sublanes
        sub_tcnt, sub_maxp = [], []                  # tsrow histogram, max k
        open_pos, open_taken, open_idx = [], [], []  # current bin's subs
        cur_xrow = -1
        for t in order:
            p, e = int(pstart[t]), int(pend[t])
            k = e - p
            xr = int(xrow[p])
            rl = int(rowl[p])
            tlane = rl & 127
            tsrow = rl >> 7
            if xr != cur_xrow:
                cur_xrow = xr
                open_pos, open_taken, open_idx = [], [], []
            s = -1
            # restrict first-fit to the newest 2 open sublanes: backtracking
            # into older tails mixes tsrows into one list, which blows up
            # the per-step roll masks (measured 12/14 active vs 2-4)
            for q in range(max(0, len(open_pos) - 2), len(open_pos)):
                if open_pos[q] + k <= LANES and not (
                        open_taken[q] >> tlane) & 1:
                    s = q
                    break
            if s < 0:
                open_pos.append(0)
                open_taken.append(0)
                open_idx.append(len(sub_words))
                sub_words.append(np.zeros(LANES, np.uint32))
                sub_vals.append(np.zeros(LANES, dt))
                sub_wrow.append(xr)
                sub_tcnt.append([0] * SUB)
                sub_maxp.append(1)
                s = len(open_pos) - 1
            si = open_idx[s]
            pos = open_pos[s]
            # |= : bits [0,14) (slot data) are written once per slot; the
            # eidx/emask/roll bits [14,26) of other parts may already live
            # at these lanes and must be preserved
            sub_words[si][pos:pos + k] |= lane[p:e] | (gb_cache[k] << 7)
            sub_vals[si][pos:pos + k] = vals_b[p:e]
            # eidx entry at the target lane (may be inside another part's
            # slot range — word bits [14,26) are disjoint from [0,14))
            sub_words[si][tlane] |= np.uint32(((pos + k - 1) << 14)
                                              | (1 << 21))
            open_pos[s] = pos + k
            open_taken[s] |= 1 << tlane
            max_part = max(max_part, k)
            sub_tcnt[si][tsrow] += 1
            sub_maxp[si] = max(sub_maxp[si], k)
            # roll bits depend on final sublane position in chunk: record
            # tsrow now, fix at pack time
            sub_words[si][tlane] |= np.uint32(tsrow << 22)  # staging: tsrow
        # pack this group's sublane lists into group-pure chunks; within a
        # chunk, assign each list to the sublane of its modal tsrow when
        # free (dist becomes 0 for tsrow-pure lists -> per-step roll masks
        # stay near-empty on banded matrices)
        nsub = len(sub_words)
        # order lists so each chunk sees ~one list per modal tsrow: bucket
        # by modal tsrow, emit round-robin
        buckets = [[] for _ in range(SUB)]
        for si in range(nsub):
            buckets[int(np.argmax(sub_tcnt[si]))].append(si)
        rr_order = []
        bi = [0] * SUB
        while len(rr_order) < nsub:
            for b in range(SUB):
                if bi[b] < len(buckets[b]):
                    rr_order.append(buckets[b][bi[b]])
                    bi[b] += 1
        for c0 in range(0, nsub, SUB):
            members = [rr_order[q] for q in range(c0, min(c0 + SUB, nsub))]
            modal = {si: int(np.argmax(sub_tcnt[si])) for si in members}
            slot_of = {}
            taken_s = [False] * SUB
            for si in sorted(members, key=lambda q: -max(sub_tcnt[q])):
                want = modal[si]
                for d in range(SUB):
                    s = (want + d) % SUB
                    if not taken_s[s]:
                        taken_s[s] = True
                        slot_of[si] = s
                        break
            chunk_smax = 0
            for s in range(SUB):
                si = next((q for q in members if slot_of[q] == s), None)
                if si is not None:
                    wd = sub_words[si]
                    # rewrite bits [22,26): r = (tsrow - s) mod 8, wrap
                    em = (wd >> 21) & 1
                    tsrow_v = (wd >> 22) & 0x7
                    r = (tsrow_v - s) % 8
                    wrap = ((s + r) >= SUB).astype(np.uint32)
                    wd = (wd & np.uint32((1 << 22) - 1)) | (r << 22) \
                        | (wrap << 25)
                    wd &= np.uint32(0x03FFFFFF)
                    # dead eidx entries keep bits zero
                    wd = np.where(em == 1, wd,
                                  wd & np.uint32(~(0xFFF << 14) & 0xFFFFFFFF))
                    word_l.append(wd)
                    vals_l.append(sub_vals[si])
                    wrow_l.append(sub_wrow[si])
                    chunk_smax = max(chunk_smax,
                                     int(sub_maxp[si] - 1).bit_length())
                else:
                    word_l.append(np.zeros(LANES, np.uint32))
                    vals_l.append(np.zeros(LANES, dt))
                    wrow_l.append(0)
            chunk_of.append(g)
            chunk_smax_l.append(chunk_smax)

    nchunks = len(chunk_of)
    if nchunks == 0:
        raise SellRBuildError("no chunks built")

    # --- quarantine "dirty" chunks (any part with |dist| > 1): they flush
    # individually (order-free RMW), so move them to the tail — clean steps
    # then gate down to a {+1, -1} roll mask instead of all 14 ---
    words_c = [np.stack(word_l[c * SUB:(c + 1) * SUB]) for c in range(nchunks)]
    vals_c = [np.stack(vals_l[c * SUB:(c + 1) * SUB]) for c in range(nchunks)]
    wrow_c = [wrow_l[c * SUB:(c + 1) * SUB] for c in range(nchunks)]
    clean_codes = {0, 1 | (0 << 3), 7 | (1 << 3)}

    def is_dirty(c):
        wd = words_c[c]
        em = ((wd >> 21) & 1) == 1
        codes = set(np.unique(((wd >> 22) & 0xF)[em]).tolist())
        return bool(codes - clean_codes)

    dirty = [c for c in range(nchunks) if is_dirty(c)]
    clean = [c for c in range(nchunks) if c not in set(dirty)]
    order_c = clean + dirty
    flush_c = np.zeros(nchunks, np.int32)
    for j, c in enumerate(order_c):
        if j < len(clean):
            nxt = order_c[j + 1] if j + 1 < len(clean) else -1
            flush_c[j] = 1 if (nxt < 0 or chunk_of[nxt] != chunk_of[c]) else 0
        else:
            flush_c[j] = 1
    word_l = [words_c[c][s] for c in order_c for s in range(SUB)]
    vals_l = [vals_c[c][s] for c in order_c for s in range(SUB)]
    wrow_l = [wrow_c[c][s] for c in order_c for s in range(SUB)]
    chunk_of = [chunk_of[c] for c in order_c]
    chunk_smax_l = [chunk_smax_l[c] for c in order_c]
    if nchunks * SUB * LANES > max_slot_factor * max(nnz, 1) * 4 + 65536:
        raise SellRBuildError(
            f"{nchunks * SUB * LANES / nnz:.1f} slots/nnz after build")
    nsteps = (nchunks + NB - 1) // NB
    nch_pad = nsteps * NB
    word = np.zeros((nch_pad * SUB, LANES), np.uint32)
    vals = np.zeros((nch_pad * SUB, LANES), dt)
    word[: nchunks * SUB] = np.stack(word_l)
    vals[: nchunks * SUB] = np.stack(vals_l)
    wrow = np.zeros(nch_pad * SUB, np.int32)
    wrow[: nchunks * SUB] = np.array(wrow_l, np.int32)

    # roll set (static, from live eidx entries) + per-STEP activation mask
    em = (word >> 21) & 1
    rcode_all = np.where(em == 1, ((word >> 22) & 0xF), 0)
    pairs = sorted({(int(c & 7), int(c >> 3))
                    for c in np.unique(rcode_all).tolist()} - {(0, 0)})
    rolls = tuple(pairs)
    code_to_bit = {r | (w << 3): j for j, (r, w) in enumerate(rolls)}

    # smeta: per step 1024 ints: [0,512) sublane wrows; [512,576) chunk meta
    smeta = np.zeros(nsteps * SMEM_BLK, np.int32)
    chunk_of_a = np.array(chunk_of + [-1] * (nch_pad - nchunks))
    live = chunk_of_a >= 0
    flush = np.zeros(nch_pad, np.int32)
    flush[:nchunks] = flush_c
    ybase = np.maximum(chunk_of_a, 0) * SUB
    cmeta = np.where(live, (ybase << 1) | flush, 0).astype(np.int32)
    chunk_smax_a = np.array(chunk_smax_l + [0] * (nch_pad - nchunks),
                            np.int32)
    for i in range(nsteps):
        smeta[i * SMEM_BLK: i * SMEM_BLK + NB * SUB] = \
            wrow[i * NB * SUB: (i + 1) * NB * SUB]
        smeta[i * SMEM_BLK + NB * SUB: i * SMEM_BLK + NB * SUB + NB] = \
            cmeta[i * NB: (i + 1) * NB]
        # per-step roll mask + scan depth
        rc = rcode_all[i * NB * SUB * LANES // LANES:
                       (i + 1) * NB * SUB]  # rows of this step
        mask = 0
        for c in np.unique(rc).tolist():
            if c in code_to_bit:
                mask |= 1 << code_to_bit[c]
        smeta[i * SMEM_BLK + NB * SUB + NB] = mask
        smeta[i * SMEM_BLK + NB * SUB + NB + 1] = int(
            chunk_smax_a[i * NB:(i + 1) * NB].max(initial=0))

    return SellR(word=jnp.asarray(word.view(np.int32)),
                 vals=jnp.asarray(vals), smeta=jnp.asarray(smeta),
                 shape=(m, n), nnz=nnz, nnz_expanded=csr.nnz_expanded,
                 nchunks=nchunks, x_rows=x_rows, y_rows=y_rows,
                 stages=int(max_part - 1).bit_length(), rolls=rolls)


# ---------------------------------------------------------------- execution

def _x_plane(A: SellR, x, dtype):
    return jnp.pad(x.astype(dtype),
                   (0, A.x_rows * LANES - x.shape[0])).reshape(
                       A.x_rows, LANES)


def _sellr_kernel(stages, rolls, smeta_ref, word_ref, val_ref,
                  x2d_ref, y_ref, v_ref, r_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def fill(j, _):
        wr = smeta_ref[j]
        v_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(wr, 1), :]
        return 0

    jax.lax.fori_loop(0, NB * SUB, fill, 0, unroll=True)
    w = word_ref[:]
    v_ref[:] = jnp.take_along_axis(v_ref[:], w & 0x7F, axis=1) * val_ref[:]
    smax = smeta_ref[NB * SUB + NB + 1]
    for k in range(stages):
        @pl.when(k < smax)
        def _(k=k):
            guard = ((w >> (7 + k)) & 1) != 0
            v_ref[:] = v_ref[:] + jnp.where(
                guard, pltpu.roll(v_ref[:], 1 << k, 1), 0.0)
    v = v_ref[:]
    E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
    live = ((w >> 21) & 1) != 0
    P = jnp.where(live, E, 0.0)
    rcode = (w >> 22) & 0xF          # r | wrap<<3
    r_ref[:] = jnp.where(live & (rcode == 0), P, 0.0)
    rollmask = smeta_ref[NB * SUB + NB]
    for j, (r, wrap) in enumerate(rolls):
        @pl.when(((rollmask >> j) & 1) == 1)
        def _(r=r, wrap=wrap):
            mask = live & (rcode == (r | (wrap << 3)))
            Q = jnp.where(mask, P, 0.0)
            shift = r if not wrap else NB * SUB - (SUB - r)
            r_ref[:] = r_ref[:] + pltpu.roll(Q, shift, 0)

    def acc(c, _):
        meta = smeta_ref[NB * SUB + c]
        acc_ref[:] = acc_ref[:] + r_ref[pl.ds(c * SUB, SUB), :]

        @pl.when((meta & 1) == 1)
        def _():
            yb = meta >> 1
            y_ref[pl.ds(yb, SUB), :] = y_ref[pl.ds(yb, SUB), :] + acc_ref[:]
            acc_ref[:] = jnp.zeros_like(acc_ref)

        return 0

    jax.lax.fori_loop(0, NB, acc, 0, unroll=True)


def sellr_pallas_raw(word, vals, smeta, x2d, *, stages, rolls, x_rows,
                     y_rows):
    """Raw-array kernel invocation (used by the SPMD distributed layer,
    where programs travel as stacked plain arrays through shard_map)."""
    nch = word.shape[0] // SUB
    nsteps = nch // NB
    interpret = jax.default_backend() not in ("tpu",)
    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((NB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((SMEM_BLK,), lambda i: (i,),
                         memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec((x_rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((y_rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_sellr_kernel, stages, rolls),
        out_shape=jax.ShapeDtypeStruct((y_rows, LANES), vals.dtype),
        grid=(nsteps,),
        in_specs=[sspec, vspec, vspec, xspec],
        out_specs=yspec,
        scratch_shapes=[pltpu.VMEM((NB * SUB, LANES), vals.dtype),
                        pltpu.VMEM((NB * SUB, LANES), vals.dtype),
                        pltpu.VMEM((SUB, LANES), vals.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(smeta, word, vals, x2d)


def spmv_sellr_pallas_2d(A: SellR, x2d: jnp.ndarray) -> jnp.ndarray:
    """Padded-layout entry: x2d (x_rows, 128) -> y2d (y_rows, 128).

    The natural kernel interface — callers that keep vectors in the padded
    plane layout (CG iterations, the bench chain) skip the per-call
    pad/slice copies of the (n,) wrapper."""
    return sellr_pallas_raw(A.word, A.vals, A.smeta, x2d, stages=A.stages,
                            rolls=A.rolls, x_rows=A.x_rows, y_rows=A.y_rows)


@register_spmv("SELLR", "pallas")
def spmv_sellr_pallas(A: SellR, x: jnp.ndarray) -> jnp.ndarray:
    x2d = _x_plane(A, x, A.vals.dtype)
    return spmv_sellr_pallas_2d(A, x2d).reshape(-1)[: A.m]


@register_spmv("SELLR", "xla")
def spmv_sellr_xla(A: SellR, x: jnp.ndarray) -> jnp.ndarray:
    """XLA lowering of the same program (correctness reference on any
    backend; the pallas kernel is the production path)."""
    nch = A.word.shape[0] // SUB
    x2d = _x_plane(A, x, A.vals.dtype)
    nsteps = nch // NB
    wrow = A.smeta.reshape(nsteps, SMEM_BLK)[:, : NB * SUB].reshape(-1)
    cmeta = A.smeta.reshape(nsteps, SMEM_BLK)[:, NB * SUB: NB * SUB + NB]
    cmeta = cmeta.reshape(-1)
    w = A.word
    wins = x2d.at[wrow].get(mode="promise_in_bounds")
    v = jnp.take_along_axis(wins, w & 0x7F, axis=1) * A.vals
    for k in range(A.stages):
        guard = ((w >> (7 + k)) & 1) != 0
        v = v + jnp.where(guard, jnp.roll(v, 1 << k, axis=1), 0.0)
    E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
    live = ((w >> 21) & 1) != 0
    P = jnp.where(live, E, 0.0)
    # place at (tsrow, lane) within each chunk: roll per (r, wrap)
    rcode = (w >> 22) & 0xF
    R = jnp.where(live & (rcode == 0), P, 0.0)
    for (r, wrap) in A.rolls:
        mask = live & (rcode == (r | (wrap << 3)))
        Q = jnp.where(mask, P, 0.0)
        Q3 = Q.reshape(nch, SUB, LANES)
        R = R + jnp.roll(Q3, r, axis=1).reshape(nch * SUB, LANES)
    # scatter chunk planes to y groups
    ybase = cmeta >> 1  # meaningless for dead chunks (all-zero planes)
    seg = jnp.repeat(ybase // SUB, SUB) * SUB + jnp.tile(
        jnp.arange(SUB), nch)
    y2 = jax.ops.segment_sum(R, seg, num_segments=A.y_rows)
    return y2.reshape(-1)[: A.m]


def execute_sellr_numpy(A: SellR, x: np.ndarray) -> np.ndarray:
    """float64 host reference of the compiled program semantics."""
    nch = int(A.word.shape[0]) // SUB
    nsteps = nch // NB
    smeta = np.asarray(A.smeta).reshape(nsteps, SMEM_BLK)
    wrow = smeta[:, : NB * SUB].reshape(-1)
    cmeta = smeta[:, NB * SUB: NB * SUB + NB].reshape(-1)
    x2d = np.zeros(A.x_rows * LANES)
    x2d[: x.shape[0]] = x
    x2d = x2d.reshape(A.x_rows, LANES)
    w = np.asarray(A.word).view(np.uint32)
    wins = x2d[wrow]
    v = (np.take_along_axis(wins, (w & 0x7F).astype(np.int64), axis=1)
         * np.asarray(A.vals).astype(np.float64))
    for k in range(A.stages):
        guard = ((w >> (7 + k)) & 1) != 0
        v = v + np.where(guard, np.roll(v, 1 << k, axis=1), 0.0)
    E = np.take_along_axis(v, ((w >> 14) & 0x7F).astype(np.int64), axis=1)
    live = ((w >> 21) & 1) != 0
    P = np.where(live, E, 0.0)
    rcode = (w >> 22) & 0xF
    R = np.where(live & (rcode == 0), P, 0.0)
    for (r, wrap) in A.rolls:
        mask = live & (rcode == (r | (wrap << 3)))
        Q = np.where(mask, P, 0.0).reshape(nch, SUB, LANES)
        R = R + np.roll(Q, r, axis=1).reshape(nch * SUB, LANES)
    y2 = np.zeros((A.y_rows, LANES))
    for c in range(nch):
        yb = int(cmeta[c]) >> 1
        y2[yb: yb + SUB] += R[c * SUB: (c + 1) * SUB]
    return y2.reshape(-1)[: A.m]


@register_spmm("SELLR", "xla")
def spmm_sellr_xla(A: SellR, X: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([spmv_sellr_xla(A, X[:, k])
                      for k in range(X.shape[1])], axis=1)
