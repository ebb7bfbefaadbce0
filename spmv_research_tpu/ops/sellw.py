"""SELLW: sublane-bound SpMV — one fused Pallas kernel, gather = ONE lane-pick.

The TPU-native answer to the reference's SELL-C-σ / window-locality formats
(``benchmark_code/BENCH/src/spmv_kernels/sell_sorted.cpp``,
``spv8.cpp:243-299`` x-gather role) for matrices with column locality
(banded, generated diagonal/low-bandwidth placement, FEM meshes).

Layout (v2 — per-sublane x2d rows)
----------------------------------
The matrix is cut into **chunks** of 8×128 = 1024 slots. Each chunk serves
one *y block* of 128 consecutive rows; **each sublane s of a chunk is bound
to one arbitrary ``x2d`` row** ``wrow[c·8+s]`` (x reshaped (n/128, 128)):
every nnz with column ``c`` is placed in a sublane bound to ``c // 128``.
The per-slot x-gather therefore needs NO cross-sublane routing — it is a
single ``take_along_axis`` lane-pick. (v1 resolved arbitrary (sublane,
lane) picks inside an 8-row window with a conflict-free rot-select over all
8 groupwise rotations — ~36 full-array passes; binding sublanes at *build*
time deletes all of them, and hot x2d rows simply get several sublanes.)

Rows are packed as contiguous *parts*: a row's nnz on one x2d row form one
part (CSR keeps them consecutive), placed whole into some sublane of that
x2d row's allocation; one row may own parts in several sublanes (one per
x2d row it touches) plus spill chunks of the same block, so no nnz is ever
unrepresentable. ``y = Σ_k out[yidx[k]]`` row-gathers sum the per-chunk
partial y rows.

**Block grouping:** a chunk actually serves a group of ``G`` adjacent y
blocks (``bid`` = log2(G) bits select which; G output planes, one per group
member). For banded matrices adjacent blocks touch mostly the same x2d
rows, so merging their bins amortizes the per-bin last-sublane slack — the
dominant waste (bins of ~80 nnz against 128-slot sublanes) — over G·bin
nnz: measured slots/nnz on the mac_econ twin 2.70 (G=1) → 2.06 (G=2) →
1.46 (G=4) → 1.33 (G=8). The tax is G masked sums in extraction. Lane
conflicts (rows of two grouped blocks with equal ``row mod 128`` ending in
one sublane) are resolved at build by first-fit over the bin's open
sublanes.

Kernel (per grid step, all chunks batched)
------------------------------------------
1. sublane fill: ``wins[8j+s] = x2d[wrow[8j+s]]`` ((1,128) dynamic slices
   from the VMEM-resident x plane — no HBM gather);
2. gather: ``acc = take_along_axis(wins, lane, axis=1)`` — one op;
3. multiply by the value plane; ``stages``-stage segmented lane scan
   (per-slot guard bits; parts never cross the 128-lane rows, and stages =
   ceil(log2(max part length)) is *adaptive* — banded matrices with short
   rows pay 3 stages, not 7);
4. extraction: per-slot lane-pick of each part's end total (``eidx`` keyed
   by (sublane, row-within-block)), masked sum over the 8 sublanes → one
   (1,128) y-partial row per chunk.

HBM traffic: one int32 word + one fp32 value per slot (8 B), plus x and the
tiny per-chunk outputs — ~4× less than the CLOSG pipeline's ~14 B/slot over
9 passes, with zero intermediate round-trips; and unlike CLOSG the whole
pipeline is one kernel.

Word bit layout (int32, per slot (s, l) of a chunk):
  [0,7)    lane pick  b     = col mod 128
  [7,14)   scan guard bits  (stage k at bit 7+k)
  [14,21)  eidx             end lane of the part of row l in sublane s
  [21]     emask            (s, l) holds a live part end
  [22,25)  bid              group member the part's row belongs to (< G ≤ 8)
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

CHUNK_PAD = 64          # chunks are padded to a multiple of this at build
_MAX_STAGES = 7         # parts ≤ 128 lanes
_X_VMEM_LIMIT = 1 << 20  # max n for the VMEM-resident x plane (4 MB fp32)


class SellWBuildError(ValueError):
    pass


@partial(_register, data_fields=("word", "vals", "wrow", "yidx"),
         meta_fields=("shape", "nnz", "nnz_expanded", "nchunks", "x_rows",
                      "K", "stages", "stream_wins", "G", "classes"))
@dataclasses.dataclass(frozen=True)
class SellW:
    word: jnp.ndarray   # (8·nchunks_pad, 128) int32 packed per-slot word
    vals: jnp.ndarray   # (8·nchunks_pad, 128) values (0 in padding)
    wrow: jnp.ndarray   # (8·nchunks_pad,) int32 per-sublane x2d row
    yidx: jnp.ndarray   # (K, nblocks) int32 chunk id per y block (nchunks=0)
    shape: Tuple[int, int]
    nnz: int
    nnz_expanded: int
    nchunks: int        # live chunks (≤ wrow.shape[0] // 8)
    x_rows: int         # x2d rows (≥ 1)
    K: int              # max chunks per y block
    stages: int         # segmented-scan stages = ceil(log2(max part len))
    stream_wins: bool = False  # n too big for VMEM x: XLA pre-gathers wins
                               # and the kernel streams them (12 B/slot)
    G: int = 2          # y blocks grouped per chunk (bid bits = log2 G)
    # stage classes: chunks sorted by required scan depth at build; each
    # class ((start_chunk, n_chunks, stages), ...) runs its own grid with
    # only the scan stages its longest part needs. The round-3 ablation
    # measured ~63 us/stage at 25M slots — the dominant per-slot op cost —
    # while most chunks of short-row matrices need 2-3 of the global 5-7
    # stages (VERDICT r3 next #1: "stage-class-sorted chunk batches").
    # Extra stages are no-ops (guard bits 0), so classes are purely an
    # op-count optimization; start/n are multiples of CHUNK_PAD.
    classes: Tuple[Tuple[int, int, int], ...] = ()

    format_name = "SELLW"

    @property
    def m(self):
        return self.shape[0]

    @property
    def n(self):
        return self.shape[1]

    def mem_footprint_bytes(self) -> int:
        return int(self.word.size * 4
                   + self.vals.size * self.vals.dtype.itemsize
                   + self.wrow.size * 4 + self.yidx.size * 4)


def _guard_bits(k: int) -> np.ndarray:
    d = np.arange(k, dtype=np.uint32)
    g = np.zeros(k, np.uint32)
    for kk in range(_MAX_STAGES):
        g |= ((d >= (1 << kk)).astype(np.uint32) << kk)
    return g


def build_sellw(csr: HostCSR, dtype=jnp.float32,
                max_chunk_factor: float = 4.0, group: int = 2,
                part_cap: int = 8, want_idx: bool = False) -> SellW:
    """Compile host CSR into a SELLW program.

    ``group`` = G adjacent y blocks share each chunk's bins (power of two
    ≤ 8; larger G amortizes last-sublane slack at the cost of G masked
    extraction sums). Raises :class:`SellWBuildError` when columns are so
    scattered that the slot count (≈ traffic blow-up) would exceed
    ``max_chunk_factor`` × nnz. x too large for VMEM residency is NOT an
    error: the program switches to the streamed-wins kernel
    (``stream_wins``, 12 B/slot).

    ``part_cap`` (power of two ≤ 128) splits parts longer than the cap
    into sub-parts at build, each with its own extraction cell — the
    masked sublane-sum already adds sub-totals per (bid, lane), so the
    scan depth is bounded by ``log2(part_cap)`` with ZERO extra slots
    (parts pack contiguously; splitting adds no padding). The round-4
    ablation measured ~63 us/stage at 25M slots — scan depth is the
    dominant per-slot cost — so capping 64-128-long parts (stages 6-7)
    at 8 (stages 3) is the "fewer scan stages for short rows" lever of
    VERDICT r3 next #1. Cost: sub-parts of one row need distinct
    sublanes with a free cell at the row's lane (first-fit handles;
    extreme rows fragment bins across chunks).
    """
    dt = np.dtype(dtype)
    G = int(group)
    cap = int(part_cap)
    if cap < 1 or cap > LANES or (cap & (cap - 1)):
        raise SellWBuildError(f"part_cap must be a power of two <= 128 ({cap})")
    if G not in (1, 2, 4, 8):
        raise SellWBuildError(f"group must be a power of two ≤ 8 ({G})")
    m, n, nnz = csr.m, csr.n, csr.nnz
    stream_wins = n > _X_VMEM_LIMIT
    if m == 0 or nnz == 0:
        raise SellWBuildError("empty matrix")
    x_rows = max((n + LANES - 1) // LANES, 1)
    nblocks = (m + LANES - 1) // LANES
    ia = csr.ia.astype(np.int64)
    ja = csr.ja.astype(np.int64)

    # fast suitability precheck, sampled: chunks per block GROUP ≈
    # max(ceil(#distinct-x2d-rows / 8), ceil(nnz / 1024)) — scattered
    # matrices (1-2 nnz per x2d row) degenerate to ~128 slots/nnz
    est_slots = est_nnz = 0
    npairs_pre = (nblocks + G - 1) // G
    for b in range(0, npairs_pre, max(npairs_pre // 64, 1)):
        e0 = int(ia[b * G * LANES])
        e1 = int(ia[min((b + 1) * G * LANES, m)])
        if e0 == e1:
            continue
        nb = np.unique(ja[e0:e1] // LANES).size
        nch = max((nb + SUB - 1) // SUB,
                  (e1 - e0 + SUB * LANES - 1) // (SUB * LANES))
        est_slots += nch * SUB * LANES
        est_nnz += e1 - e0
    if est_nnz and est_slots > max_chunk_factor * 1.5 * est_nnz:
        raise SellWBuildError(
            f"estimated {est_slots / est_nnz:.1f} slots/nnz "
            "(no column locality — not a SELLW matrix)")

    chunk_cap = max(int(max_chunk_factor * (nnz / (SUB * LANES) + nblocks)
                        + 64), 64)

    # native packer tier (native/sparse_host.cpp sellw_pack — identical
    # algorithm, ~50x the Python loop; conversion time is a reported metric)
    from ..io import native as _native
    if (_native.have_sellw_pack(cap) and dt == np.float32 and G == 2
            and not (want_idx and not _native.have_sellw_pack(1))):
        packed = _native.sellw_pack_native(
            ia, csr.ja, csr.a.astype(np.float32), m, part_cap=cap,
            want_idx=want_idx)
        word_n, vals_n, wrow_n, pair_n, bids_n, max_part = packed[:6]
        idx_n = packed[6] if want_idx else None
        if pair_n.shape[0] > chunk_cap:
            raise SellWBuildError(
                f"chunk count {pair_n.shape[0]} exceeded {chunk_cap} "
                "(scattered columns)")
        return _emit_sellw(word_n.view(np.uint32), vals_n, wrow_n,
                           list(pair_n), [tuple(bool(b & (1 << g))
                                                for g in range(G))
                                          for b in bids_n],
                           max_part, m, n, nnz, csr.nnz_expanded, x_rows,
                           nblocks, dt, stream_wins, G, idx_u=idx_n)

    wrow_l, word_l, vals_l, idx_l = [], [], [], []
    chunk_pair, chunk_bids = [], []
    gb_cache = {k: _guard_bits(k) for k in range(1, LANES + 1)}
    max_part = 1
    npairs = (nblocks + G - 1) // G

    for pb in range(npairs):
        r0, r1 = pb * G * LANES, min((pb + 1) * G * LANES, m)
        e0, e1 = int(ia[r0]), int(ia[r1])
        if e0 == e1:
            continue
        cols_b = ja[e0:e1]
        vals_b = csr.a[e0:e1].astype(dt)
        lens = ia[r0 + 1:r1 + 1] - ia[r0:r1]
        rowl_b = np.repeat(np.arange(r1 - r0), lens)   # 0..G·128-1 in group
        blk_b = cols_b // LANES
        # parts = maximal runs of equal (row, x2d row); CSR keeps a row's
        # nnz on one x2d row consecutive. Order parts by (x2d row, length
        # desc) so each bin's sublanes fill first-fit with its big parts
        # first (less end-of-sublane slack).
        pstart = np.flatnonzero(np.r_[True, (np.diff(rowl_b) != 0)
                                      | (np.diff(blk_b) != 0)])
        pend = np.append(pstart[1:], cols_b.size)
        plen = pend - pstart
        if cap < LANES and plen.size and int(plen.max()) > cap:
            # split long parts into <= cap sub-parts (see docstring)
            n_pieces = (plen + cap - 1) // cap
            idx = np.repeat(np.arange(plen.size), n_pieces)
            within = (np.arange(idx.size)
                      - np.repeat(np.cumsum(n_pieces) - n_pieces, n_pieces))
            pstart = pstart[idx] + within * cap
            pend = np.minimum(pstart + cap, pend[idx])
            plen = pend - pstart
        porder = np.lexsort((-plen, blk_b[pstart]))
        queue = list(porder)
        while queue:
            wd = np.zeros((SUB, LANES), np.uint32)
            ex = np.zeros((SUB, LANES), np.uint32)  # eidx/emask (ORed last:
            vv = np.zeros((SUB, LANES), dt)         # lanes overlap slots)
            iv = np.full((SUB, LANES), -1, np.int32) if want_idx else None
            wr = np.zeros(SUB, np.int32)
            pos = [0] * SUB
            sub_of = {}         # x2d row -> open sublanes (in open order)
            next_s = 0
            bids = [False] * G
            defer = []
            for t in queue:
                p, q, k = int(pstart[t]), int(pend[t]), int(plen[t])
                r = int(blk_b[p])
                l = int(rowl_b[p])
                lane, bid = l & (LANES - 1), l >> 7
                s = -1
                for so in sub_of.get(r, ()):   # first fit, lane-conflict-free
                    if pos[so] + k <= LANES and not ex[so, lane]:
                        s = so
                        break
                if s < 0:
                    if next_s >= SUB:
                        defer.append(t)
                        continue
                    s, next_s = next_s, next_s + 1
                    sub_of.setdefault(r, []).append(s)
                    wr[s] = r
                wd[s, pos[s]:pos[s] + k] = (
                    (cols_b[p:q] % LANES).astype(np.uint32)
                    | (gb_cache[k] << 7))
                vv[s, pos[s]:pos[s] + k] = vals_b[p:q]
                if want_idx:
                    iv[s, pos[s]:pos[s] + k] = np.arange(e0 + p, e0 + q,
                                                         dtype=np.int32)
                ex[s, lane] = np.uint32(((pos[s] + k - 1) << 14)
                                        | (1 << 21) | (bid << 22))
                pos[s] += k
                bids[bid] = True
                max_part = max(max_part, k)
            wd |= ex
            wrow_l.append(wr)
            word_l.append(wd)
            vals_l.append(vv)
            if want_idx:
                idx_l.append(iv)
            chunk_pair.append(pb)
            chunk_bids.append(tuple(bids))
            queue = defer
            if len(wrow_l) > chunk_cap:
                raise SellWBuildError(
                    f"chunk count exceeded {chunk_cap} (scattered columns)")

    word_u = (np.concatenate(word_l, axis=0) if wrow_l
              else np.zeros((0, LANES), np.uint32))
    vals_u = (np.concatenate(vals_l, axis=0) if wrow_l
              else np.zeros((0, LANES), dt))
    wrow_u = (np.concatenate(wrow_l) if wrow_l
              else np.zeros(0, np.int32))
    idx_u = (np.concatenate(idx_l, axis=0) if want_idx and idx_l
             else (np.zeros((0, LANES), np.int32) if want_idx else None))
    return _emit_sellw(word_u, vals_u, wrow_u, chunk_pair, chunk_bids,
                       max_part, m, n, nnz, csr.nnz_expanded, x_rows,
                       nblocks, dt, stream_wins, G, idx_u=idx_u)


def _stage_classes(word_u, nchunks):
    """Per-chunk required scan depth from the packed guard bits, and a
    small set of contiguous classes (chunks sorted by depth).

    Guard bit k is set on a slot at in-part position d iff d ≥ 2^k, so the
    OR of a chunk's guard fields has highest bit ⌊log2(max d)⌋ and
    ``bit_length(OR) == ceil(log2(max part len))`` — the exact per-chunk
    stage count. Returns (perm, class list [(n_chunks, stages), ...]).
    """
    g = (word_u.view(np.uint32) >> 7) & 0x7F
    g_or = np.bitwise_or.reduce(g.reshape(nchunks, SUB * LANES), axis=1)
    stages_c = np.zeros(nchunks, np.int64)
    nz = g_or > 0
    stages_c[nz] = np.floor(np.log2(g_or[nz])).astype(np.int64) + 1
    perm = np.argsort(stages_c, kind="stable")
    counts = np.bincount(stages_c, minlength=_MAX_STAGES + 1)
    classes = [(int(c), s) for s, c in enumerate(counts) if c > 0]
    # merge small classes upward: a pallas_call + its CHUNK_PAD padding is
    # only worth >= ~2 grid blocks of chunks
    merged = []
    for cnt, s in classes:
        if merged and (merged[-1][0] < 2 * CHUNK_PAD
                       or cnt < 2 * CHUNK_PAD):
            pc, _ = merged.pop()
            merged.append((pc + cnt, s))     # higher stages win (no-op pad)
        else:
            merged.append((cnt, s))
    return perm, merged


def _emit_sellw(word_u, vals_u, wrow_u, chunk_pair, chunk_bids, max_part,
                m, n, nnz, nnz_expanded, x_rows, nblocks, dt,
                stream_wins, G, idx_u=None):
    """Sort chunks into stage classes, pad per class, build yidx, assemble
    the pytree (shared tail of the native and Python packer tiers).

    With ``idx_u`` (per-slot source-nnz plane, -1 empty) returns
    ``(SellW, idx_padded)`` — the DS build (ops/sellw_ds.py) uses it to
    place fp64-pair value planes on the identical routing program."""
    nchunks = len(chunk_pair)
    if nchunks:
        perm, klasses = _stage_classes(word_u, nchunks)
        word_u = word_u.reshape(nchunks, SUB, LANES)[perm].reshape(-1, LANES)
        vals_u = vals_u.reshape(nchunks, SUB, LANES)[perm].reshape(-1, LANES)
        wrow_u = wrow_u.reshape(nchunks, SUB)[perm].reshape(-1)
        if idx_u is not None:
            idx_u = idx_u.reshape(nchunks, SUB, LANES)[perm].reshape(
                -1, LANES)
        chunk_pair = [chunk_pair[p] for p in perm]
        chunk_bids = [chunk_bids[p] for p in perm]
    else:
        klasses = [(0, 0)]

    # lay classes out contiguously, each padded to a CHUNK_PAD multiple
    classes = []
    padded_pos = np.zeros(max(nchunks, 1), np.int64)
    npad = 0
    src = 0
    seg_src, seg_dst, seg_len = [], [], []
    for cnt, s in klasses:
        n_pad = ((cnt + CHUNK_PAD - 1) // CHUNK_PAD) * CHUNK_PAD
        if cnt:
            padded_pos[src: src + cnt] = npad + np.arange(cnt)
            seg_src.append(src)
            seg_dst.append(npad)
            seg_len.append(cnt)
        classes.append((npad, n_pad, s))
        npad += n_pad
        src += cnt
    npad = max(npad, CHUNK_PAD)

    word = np.zeros((npad * SUB, LANES), np.uint32)
    vals = np.zeros((npad * SUB, LANES), dt)
    wrow = np.zeros(npad * SUB, np.int32)
    idxp = (np.full((npad * SUB, LANES), -1, np.int32)
            if idx_u is not None else None)
    for s0, d0, ln in zip(seg_src, seg_dst, seg_len):
        word[d0 * SUB: (d0 + ln) * SUB] = word_u[s0 * SUB: (s0 + ln) * SUB]
        vals[d0 * SUB: (d0 + ln) * SUB] = vals_u[s0 * SUB: (s0 + ln) * SUB]
        wrow[d0 * SUB: (d0 + ln) * SUB] = wrow_u[s0 * SUB: (s0 + ln) * SUB]
        if idxp is not None:
            idxp[d0 * SUB: (d0 + ln) * SUB] = idx_u[s0 * SUB:
                                                    (s0 + ln) * SUB]

    # output rows: group-member g's partials live at [g·npad, (g+1)·npad),
    # the all-zero row at G·npad
    slot = np.zeros(max(nblocks, 1), np.int64)
    entries = []
    for c, (pb, bids) in enumerate(zip(chunk_pair, chunk_bids)):
        for bid in range(G):
            b = G * pb + bid
            if bids[bid] and b < nblocks:
                entries.append((b, int(padded_pos[c]) + bid * npad))
                slot[b] += 1
    K = max(int(slot.max()) if nblocks else 1, 1)
    if K > 64:
        raise SellWBuildError(f"y-block multiplicity {K} > 64")
    yidx = np.full((K, nblocks), G * npad, np.int32)   # G·npad = zero row
    slot[:] = 0
    for b, row in entries:
        yidx[slot[b], b] = row
        slot[b] += 1

    A = SellW(word=jnp.asarray(word.view(np.int32)),
              vals=jnp.asarray(vals), wrow=jnp.asarray(wrow),
              yidx=jnp.asarray(yidx), shape=(m, n), nnz=nnz,
              nnz_expanded=nnz_expanded, nchunks=nchunks,
              x_rows=x_rows, K=K,
              stages=int(max_part - 1).bit_length(),
              stream_wins=stream_wins, G=G,
              classes=tuple(classes))
    if idxp is not None:
        return A, idxp
    return A


# ---------------------------------------------------------------- execution

def _x_plane(A: SellW, x, dtype):
    return jnp.pad(x.astype(dtype),
                   (0, A.x_rows * LANES - x.shape[0])).reshape(
                       A.x_rows, LANES)


def _combine_y(A: SellW, planes):
    outp = jnp.concatenate(
        list(planes) + [jnp.zeros((1, LANES), planes[0].dtype)], axis=0)
    y2 = outp.at[A.yidx].get(mode="promise_in_bounds").sum(axis=0)
    return y2.reshape(-1)[: A.m]


@register_spmv("SELLW", "xla")
def spmv_sellw_xla(A: SellW, x: jnp.ndarray) -> jnp.ndarray:
    nch = A.wrow.shape[0] // SUB
    x2d = _x_plane(A, x, A.vals.dtype)
    wins = x2d.at[A.wrow].get(mode="promise_in_bounds")    # (nch·8, 128)
    w = A.word
    v = jnp.take_along_axis(wins, w & 0x7F, axis=1) * A.vals
    for k in range(A.stages):
        guard = ((w >> (7 + k)) & 1) != 0
        v = v + jnp.where(guard, jnp.roll(v, 1 << k, axis=1), 0.0)
    E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
    live = ((w >> 21) & 1) != 0
    bid = (w >> 22) & (A.G - 1)
    planes = [jnp.where(live & (bid == g), E, 0.0)
              .reshape(nch, SUB, LANES).sum(axis=1) for g in range(A.G)]
    return _combine_y(A, planes)


def _extract_planes(G, nB, w, E):
    """G masked (nB,128) extraction planes from the end-pick E.

    Direct per-g masks; a select/subtract split tree (2·(G−1)+2 passes
    instead of 3·G) measured SLOWER at every G on v5e — the dependent
    subtract chain schedules worse than independent fused masks."""
    live = ((w >> 21) & 1) != 0
    bid = (w >> 22) & (G - 1)
    return [jnp.sum(jnp.where(live & (bid == g), E, 0.0)
                    .reshape(nB, SUB, LANES), axis=1) for g in range(G)]


def _sellw_kernel(nB, stages, G, base, wrow_ref, word_ref, val_ref,
                  x2d_ref, *orefs_wins):
    """One grid step: nB chunks, all stages batched over (8·nB, 128).
    ``base`` = the stage class's first chunk (wrow is passed whole).

    Fill: one flat unrolled stream of (1,128) dynamic row copies. Two
    batching attempts measured SLOWER on v5e and were reverted (round-5
    201a/201c labs): a span<8 block-read + in-vreg sublane gather
    (take_along_axis(axis=0) lowers to a generic path) AND a per-chunk
    pl.when uniform-broadcast — both landed ~22 vs 34 Gnnz/s on cant;
    the branchy per-chunk loop itself defeats Mosaic's scheduling of
    the copy stream."""
    orefs, wins_ref = orefs_wins[:G], orefs_wins[G]
    i = pl.program_id(0)

    def fill(j, _):
        wr = wrow_ref[(base + i * nB) * SUB + j]
        wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(wr, 1), :]
        return 0

    jax.lax.fori_loop(0, nB * SUB, fill, 0, unroll=True)
    w = word_ref[:]
    v = jnp.take_along_axis(wins_ref[:], w & 0x7F, axis=1) * val_ref[:]
    for k in range(stages):
        guard = ((w >> (7 + k)) & 1) != 0
        v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
    E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
    for g, z in enumerate(_extract_planes(G, nB, w, E)):
        orefs[g][:] = z


def _sellw_stream_kernel(nB, stages, G, wins_ref, word_ref, val_ref,
                         *orefs):
    """Streamed-wins variant: wins pre-gathered by XLA (n too big for a
    VMEM-resident x plane), streamed per grid block like word/vals."""
    w = word_ref[:]
    v = jnp.take_along_axis(wins_ref[:], w & 0x7F, axis=1) * val_ref[:]
    for k in range(stages):
        guard = ((w >> (7 + k)) & 1) != 0
        v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
    E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
    for g, z in enumerate(_extract_planes(G, nB, w, E)):
        orefs[g][:] = z


def _class_plan(A: SellW):
    """((start_chunk, n_chunks, stages), ...) — stage classes when the
    build recorded them, else one global-stages class (old cache entries)."""
    nch = A.wrow.shape[0] // SUB
    cls = [c for c in (A.classes or ()) if c[1] > 0]
    if not cls:
        cls = [(0, nch, A.stages)]
    return cls, nch


@register_spmv("SELLW", "pallas")
def spmv_sellw_pallas(A: SellW, x: jnp.ndarray) -> jnp.ndarray:
    classes, nch = _class_plan(A)
    x2d = _x_plane(A, x, A.vals.dtype)
    interpret = jax.default_backend() not in ("tpu",)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    wins = (x2d.at[A.wrow].get(mode="promise_in_bounds")
            if A.stream_wins else None)
    parts = []      # per-class G-tuples of (n_pad_c, LANES) planes
    for start, cnt, stages in classes:
        nB = min(CHUNK_PAD, cnt)
        base_blk = start // nB
        blk = lambda i, b=base_blk: (i + b, 0)  # noqa: E731
        vspec = pl.BlockSpec((nB * SUB, LANES), blk,
                             memory_space=pltpu.VMEM)
        oblk = lambda i: (i, 0)  # noqa: E731
        ospecs = tuple(pl.BlockSpec((nB, LANES), oblk,
                                    memory_space=pltpu.VMEM)
                       for _ in range(A.G))
        oshape = tuple(jax.ShapeDtypeStruct((cnt, LANES), A.vals.dtype)
                       for _ in range(A.G))
        if A.stream_wins:
            planes = pl.pallas_call(
                partial(_sellw_stream_kernel, nB, stages, A.G),
                out_shape=oshape, grid=(cnt // nB,),
                in_specs=[vspec, vspec, vspec], out_specs=ospecs,
                compiler_params=params, interpret=interpret,
            )(wins, A.word, A.vals)
        else:
            planes = pl.pallas_call(
                partial(_sellw_kernel, nB, stages, A.G, start),
                out_shape=oshape, grid=(cnt // nB,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM), vspec, vspec,
                    pl.BlockSpec((A.x_rows, LANES), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=ospecs,
                scratch_shapes=[pltpu.VMEM((nB * SUB, LANES),
                                           A.vals.dtype)],
                compiler_params=params, interpret=interpret,
            )(A.wrow, A.word, A.vals, x2d)
        parts.append(planes)
    if len(parts) == 1:
        planes = parts[0]
    else:
        planes = [jnp.concatenate([p[g] for p in parts], axis=0)
                  for g in range(A.G)]
    if planes[0].shape[0] < nch:      # trailing all-pad region (empty build)
        pad = nch - planes[0].shape[0]
        planes = [jnp.pad(p, ((0, pad), (0, 0))) for p in planes]
    return _combine_y(A, planes)


def execute_sellw_numpy(A: SellW, x: np.ndarray) -> np.ndarray:
    """float64 host reference of the compiled program (program semantics)."""
    nch = int(A.wrow.shape[0]) // SUB
    x2d = np.zeros(A.x_rows * LANES)
    x2d[: x.shape[0]] = x
    x2d = x2d.reshape(A.x_rows, LANES)
    w = np.asarray(A.word).view(np.uint32)
    wins = x2d[np.asarray(A.wrow)]
    v = (np.take_along_axis(wins, (w & 0x7F).astype(np.int64), axis=1)
         * np.asarray(A.vals).astype(np.float64))
    for k in range(A.stages):
        guard = ((w >> (7 + k)) & 1) != 0
        v = v + np.where(guard, np.roll(v, 1 << k, axis=1), 0.0)
    E = np.take_along_axis(v, ((w >> 14) & 0x7F).astype(np.int64), axis=1)
    live = ((w >> 21) & 1) != 0
    bid = (w >> 22) & (A.G - 1)
    planes = [np.where(live & (bid == g), E, 0.0)
              .reshape(nch, SUB, LANES).sum(axis=1) for g in range(A.G)]
    outp = np.concatenate(planes + [np.zeros((1, LANES))], axis=0)
    y2 = outp[np.asarray(A.yidx)].sum(axis=0)
    return y2.reshape(-1)[: A.m]


# ------------------------------------------------------------------- SpMM

def _spmm_x_planes(A: SellW, X, dtype, kt):
    """Pad X (n, K) to K' = 8·ceil(K/8) and return per-k x2d planes
    (K', x_rows, 128)."""
    n, K = X.shape
    Kp = 8 * kt
    Xp = jnp.zeros((A.x_rows * LANES, Kp), dtype)
    Xp = Xp.at[:n, :K].set(X.astype(dtype))
    return jnp.transpose(Xp.reshape(A.x_rows, LANES, Kp), (2, 0, 1))


def _sellw_spmm_kernel(nB, stages, G, wrow_ref, word_ref, val_ref,
                       *refs):
    """One grid step, one k-tile of 8: per k, the SpMV pipeline re-runs on
    the k-th x plane while word/vals stay VMEM-resident. Outputs are
    k-major within the step's block: rows [kk·nB, (kk+1)·nB)."""
    xrefs, orefs, wins_ref = refs[:8], refs[8:8 + G], refs[8 + G]
    i = pl.program_id(0)
    w = word_ref[:]
    eidx = (w >> 14) & 0x7F
    lane = w & 0x7F
    for kk in range(8):
        def fill(j, _, kk=kk):
            wr = wrow_ref[i * nB * SUB + j]
            wins_ref[pl.ds(j, 1), :] = xrefs[kk][pl.ds(wr, 1), :]
            return 0

        jax.lax.fori_loop(0, nB * SUB, fill, 0, unroll=True)
        v = jnp.take_along_axis(wins_ref[:], lane, axis=1) * val_ref[:]
        for k in range(stages):
            guard = ((w >> (7 + k)) & 1) != 0
            v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
        E = jnp.take_along_axis(v, eidx, axis=1)
        for g, z in enumerate(_extract_planes(G, nB, w, E)):
            orefs[g][pl.ds(kk * nB, nB), :] = z


@register_spmm("SELLW", "pallas")
def spmm_sellw_pallas(A: SellW, X: jnp.ndarray) -> jnp.ndarray:
    """Y = A @ X: k-tiles of 8 over the fused SELLW pipeline (word/vals are
    read once per tile; the reference's bench_spmm.cpp role with the K_DIM
    sweep, config.sh:138-143)."""
    n, K = X.shape
    if A.stream_wins:
        return spmm_sellw_xla(A, X)
    nch = A.wrow.shape[0] // SUB
    nB = min(CHUNK_PAD, nch)
    kt = (K + 7) // 8
    Xp = _spmm_x_planes(A, X, A.vals.dtype, kt)
    interpret = jax.default_backend() not in ("tpu",)
    blk = lambda i: (i, 0)  # noqa: E731
    blk8 = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((nB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((A.x_rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((8 * nB, LANES), blk8, memory_space=pltpu.VMEM)
    cols = []
    for t in range(kt):
        planes = pl.pallas_call(
            partial(_sellw_spmm_kernel, nB, A.stages, A.G),
            out_shape=tuple(
                jax.ShapeDtypeStruct((8 * nch, LANES), A.vals.dtype)
                for _ in range(A.G)),
            grid=(nch // nB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vspec, vspec]
            + [xspec] * 8,
            out_specs=(ospec,) * A.G,
            scratch_shapes=[pltpu.VMEM((nB * SUB, LANES), A.vals.dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(A.wrow, A.word, A.vals,
          *[Xp[8 * t + kk] for kk in range(8)])
        # un-interleave the k-major step blocks -> (8, nch, 128)
        planes = [jnp.transpose(o.reshape(nch // nB, 8, nB, LANES),
                                (1, 0, 2, 3)).reshape(8, nch, LANES)
                  for o in planes]
        for kk in range(8):
            if 8 * t + kk < K:
                cols.append(_combine_y(A, [o[kk] for o in planes]))
    return jnp.stack(cols, axis=1)


@register_spmm("SELLW", "xla")
def spmm_sellw_xla(A: SellW, X: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([spmv_sellw_xla(A, X[:, k])
                      for k in range(X.shape[1])], axis=1)
