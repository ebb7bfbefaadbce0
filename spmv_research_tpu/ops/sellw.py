"""SELLW: window-SELL SpMV — one fused Pallas kernel at ~8 B/slot HBM traffic.

The TPU-native answer to the reference's SELL-C-σ / window-locality formats
(``benchmark_code/BENCH/src/spmv_kernels/sell_sorted.cpp``,
``spv8.cpp:243-299`` x-gather role) for matrices with column locality
(post-RCM banded, generated diagonal-placement, FEM meshes).

Layout
------
The matrix is cut into **chunks** of 8×128 = 1024 slots. Each chunk serves one
*y block* of 128 consecutive rows and carries one *x window* of 8 consecutive
``x2d`` rows (1024 consecutive x entries, start ``w0``). Rows are packed as
contiguous *segments* (≤128 nnz) into the chunk's 8 sublanes (greedy
fill-balanced); a row may hold at most one segment per sublane (up to 8 per
chunk) and spill into further chunks of the same block (other windows), so no
nnz is ever unrepresentable: out-of-window and overflow entries simply form
secondary chunks, and ``y = Σ_k out[yidx[k]]`` row-gathers sum the per-chunk
partials.

Kernel (per chunk, all batched over the grid step's chunks)
----------------------------------------------------------
1. window: ``wins = x2d[w0 : w0+8]`` (dynamic sublane slice from the
   VMEM-resident x plane — no HBM gather at all);
2. **conflict-free two-stage gather**: for each of the 8 groupwise vertical
   rotations r of ``wins``, one per-slot lane-pick, then a per-slot select by
   ``rot = (win_row − sublane) mod 8``. Because the lane-pick is applied to
   *every* rotation before selecting, both indices are consumed per-slot —
   unlike composing sublane-pick∘lane-pick, whose first index is keyed by
   (sublane, source lane) and conflicts (the constraint that shaped the CLOSG
   y-extraction). Duplication is free, the builder needs no conflict
   resolution, and there are no spills by construction.
3. multiply by the value plane; 7-stage segmented lane scan (per-slot guard
   bits; segments never cross the 128-lane rows);
4. extraction: per-slot lane-pick of each segment's end total (``eidx`` keyed
   by (sublane, row-within-block) — one segment per (row, sublane), so no
   conflicts), masked sum over the 8 sublanes → one (1,128) y-partial row.

HBM traffic: one int32 word + one fp32 value per slot (8 B), plus x and the
tiny per-chunk outputs — ~4× less than the CLOSG pipeline's ~14 B/slot over
9 passes, with zero intermediate round-trips.

Word bit layout (int32, per slot (s, l) of a chunk):
  [0,7)   lane pick  b      = col mod 128
  [7,10)  rot               = (col//128 − w0 − s) mod 8
  [10,17) scan guard bits   (stage k at bit 10+k)
  [17,24) eidx              end lane of row l's segment in sublane s
  [24]    emask             (s, l) holds a live segment end
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
from .dispatch import register_spmv
from .clos import _register
from .clos_route import LANES, SUB

CHUNK_PAD = 64          # chunks are padded to a multiple of this at build
_SCAN_STAGES = 7        # segments ≤ 128 lanes
_X_VMEM_LIMIT = 1 << 20  # max n for the VMEM-resident x plane (4 MB fp32)


class SellWBuildError(ValueError):
    pass


@partial(_register, data_fields=("word", "vals", "w0", "yidx"),
         meta_fields=("shape", "nnz", "nnz_expanded", "nchunks", "x_rows",
                      "K"))
@dataclasses.dataclass(frozen=True)
class SellW:
    word: jnp.ndarray   # (8·nchunks_pad, 128) int32 packed per-slot word
    vals: jnp.ndarray   # (8·nchunks_pad, 128) values (0 in padding)
    w0: jnp.ndarray     # (nchunks_pad,) int32 window start (x2d row)
    yidx: jnp.ndarray   # (K, nblocks) int32 chunk id per y block (nchunks=0-row)
    shape: Tuple[int, int]
    nnz: int
    nnz_expanded: int
    nchunks: int        # live chunks (≤ w0.shape[0])
    x_rows: int         # x2d rows (≥ 8)
    K: int              # max chunks per y block

    format_name = "SELLW"

    @property
    def m(self):
        return self.shape[0]

    @property
    def n(self):
        return self.shape[1]

    def mem_footprint_bytes(self) -> int:
        return int(self.word.size * 4 + self.vals.size * self.vals.dtype.itemsize
                   + self.w0.size * 4 + self.yidx.size * 4)


def _guard_bits(k: int) -> np.ndarray:
    d = np.arange(k, dtype=np.uint32)
    g = np.zeros(k, np.uint32)
    for kk in range(_SCAN_STAGES):
        g |= ((d >= (1 << kk)).astype(np.uint32) << kk)
    return g


def build_sellw(csr: HostCSR, dtype=jnp.float32,
                max_chunk_factor: float = 8.0,
                min_coverage: float = 0.25) -> SellW:
    """Compile host CSR into a SELLW program.

    Raises :class:`SellWBuildError` when the matrix is a poor fit: x too
    large for VMEM residency, or column structure so scattered that the
    chunk count (≈ traffic blow-up) exceeds ``max_chunk_factor`` × ideal.
    """
    dt = np.dtype(dtype)
    m, n, nnz = csr.m, csr.n, csr.nnz
    if n > _X_VMEM_LIMIT:
        raise SellWBuildError(f"n={n} exceeds the VMEM-resident x limit")
    if m == 0 or nnz == 0:
        raise SellWBuildError("empty matrix")
    x_rows = max((n + LANES - 1) // LANES, SUB)
    nblocks = (m + LANES - 1) // LANES
    ia = csr.ia.astype(np.int64)
    ja = csr.ja.astype(np.int64)

    # fast suitability precheck: best-8-window coverage per y block must be
    # healthy on average, else the multi-pass builder degenerates into
    # thousands of nearly-empty chunks (e.g. placement=random matrices,
    # where no 1024-wide x window captures a useful nnz fraction)
    cov_num = cov_den = 0
    for b in range(0, nblocks, max(nblocks // 64, 1)):
        e0, e1 = int(ia[b * LANES]), int(ia[min((b + 1) * LANES, m)])
        if e0 == e1:
            continue
        blk = ja[e0:e1] // LANES
        lo = int(blk.min())
        h = np.bincount(blk - lo)
        c = np.cumsum(np.concatenate([[0], h]))
        best = (c[SUB:] - c[:-SUB]).max() if h.size > SUB else e1 - e0
        cov_num += int(best)
        cov_den += e1 - e0
    if cov_den and cov_num < min_coverage * cov_den:
        raise SellWBuildError(
            f"window coverage {cov_num / cov_den:.2f} < {min_coverage} "
            "(no column locality — not a SELLW matrix)")

    chunk_cap = max(int(max_chunk_factor * (nnz / (SUB * LANES) + nblocks)
                        + 64), 64)
    w0_l, word_l, vals_l, chunk_block = [], [], [], []
    gb_cache = {k: _guard_bits(k) for k in range(1, LANES + 1)}

    for b in range(nblocks):
        r0, r1 = b * LANES, min((b + 1) * LANES, m)
        e0, e1 = int(ia[r0]), int(ia[r1])
        if e0 == e1:
            continue
        cols_b = ja[e0:e1]
        vals_b = csr.a[e0:e1].astype(dt)
        lens = ia[r0 + 1:r1 + 1] - ia[r0:r1]
        rowl_b = np.repeat(np.arange(r1 - r0), lens)
        unplaced = np.arange(e1 - e0)
        while unplaced.size:
            blk = cols_b[unplaced] // LANES
            lo, hi = int(blk.min()), int(blk.max())
            if hi - lo + 1 <= SUB:
                W0 = min(lo, x_rows - SUB)
            else:
                h = np.bincount(blk - lo, minlength=hi - lo + 1)
                c = np.cumsum(np.concatenate([[0], h]))
                W0 = lo + int(np.argmax(c[SUB:] - c[:-SUB]))
                W0 = min(W0, x_rows - SUB)
            inw = (blk >= W0) & (blk < W0 + SUB)
            ids = unplaced[inw]
            # --- greedy segment packing into 8 sublanes -------------------
            rl = rowl_b[ids]
            starts = np.flatnonzero(np.diff(rl, prepend=-1))
            ends = np.append(starts[1:], ids.size)
            sl_len = [0] * SUB
            sl_segs = [[] for _ in range(SUB)]   # (row_l, p, q) into ids
            placed = np.zeros(ids.size, bool)
            for t in range(starts.size):
                p, q, l = int(starts[t]), int(ends[t]), int(rl[starts[t]])
                used = 0
                while p < q and used != (1 << SUB) - 1:
                    best, bestfree = -1, 0
                    for s in range(SUB):
                        if used >> s & 1:
                            continue
                        fr = LANES - sl_len[s]
                        if fr > bestfree:
                            best, bestfree = s, fr
                    if bestfree == 0:
                        break
                    take = min(q - p, bestfree)
                    sl_segs[best].append((l, p, p + take))
                    placed[p:p + take] = True
                    sl_len[best] += take
                    used |= 1 << best
                    p += take
            # --- emit ------------------------------------------------------
            wd = np.zeros((SUB, LANES), np.uint32)
            ex = np.zeros((SUB, LANES), np.uint32)  # eidx/emask plane (ORed in
            vv = np.zeros((SUB, LANES), dt)         # last: lanes overlap slots)
            for s in range(SUB):
                pos = 0
                for (l, p, q) in sl_segs[s]:
                    k = q - p
                    sel = ids[p:q]
                    cc = cols_b[sel]
                    bq = (cc % LANES).astype(np.uint32)
                    rot = ((cc // LANES - W0 - s) % SUB).astype(np.uint32)
                    wd[s, pos:pos + k] = bq | (rot << 7) | (gb_cache[k] << 10)
                    vv[s, pos:pos + k] = vals_b[sel]
                    ex[s, l] = np.uint32(((pos + k - 1) << 17) | (1 << 24))
                    pos += k
            wd |= ex
            w0_l.append(W0)
            word_l.append(wd)
            vals_l.append(vv)
            chunk_block.append(b)
            unplaced = np.sort(np.concatenate(
                [unplaced[~inw], ids[~placed]]))
            if len(w0_l) > chunk_cap:
                raise SellWBuildError(
                    f"chunk count exceeded {chunk_cap} (scattered columns)")

    nchunks = len(w0_l)
    npad = ((nchunks + CHUNK_PAD - 1) // CHUNK_PAD) * CHUNK_PAD
    word = np.zeros((npad * SUB, LANES), np.uint32)
    vals = np.zeros((npad * SUB, LANES), dt)
    if nchunks:
        word[: nchunks * SUB] = np.concatenate(word_l, axis=0)
        vals[: nchunks * SUB] = np.concatenate(vals_l, axis=0)
    w0 = np.zeros(npad, np.int32)
    w0[:nchunks] = np.asarray(w0_l, np.int32)
    counts = np.bincount(np.asarray(chunk_block, np.int64),
                         minlength=nblocks) if nchunks else np.zeros(
                             nblocks, np.int64)
    K = max(int(counts.max()) if nblocks else 1, 1)
    if K > 64:
        raise SellWBuildError(f"y-block multiplicity {K} > 64")
    yidx = np.full((K, nblocks), npad, np.int32)   # npad = zero row
    slot = np.zeros(nblocks, np.int64)
    for c, b in enumerate(chunk_block):
        yidx[slot[b], b] = c
        slot[b] += 1

    return SellW(word=jnp.asarray(word.view(np.int32)),
                 vals=jnp.asarray(vals), w0=jnp.asarray(w0),
                 yidx=jnp.asarray(yidx), shape=(m, n), nnz=nnz,
                 nnz_expanded=csr.nnz_expanded, nchunks=nchunks,
                 x_rows=x_rows, K=K)


# ---------------------------------------------------------------- execution

def _x_plane(A: SellW, x, dtype):
    return jnp.pad(x.astype(dtype),
                   (0, A.x_rows * LANES - x.shape[0])).reshape(
                       A.x_rows, LANES)


def _combine_y(A: SellW, out):
    outp = jnp.concatenate(
        [out, jnp.zeros((1, LANES), out.dtype)], axis=0)
    y2 = outp.at[A.yidx].get(mode="promise_in_bounds").sum(axis=0)
    return y2.reshape(-1)[: A.m]


@register_spmv("SELLW", "xla")
def spmv_sellw_xla(A: SellW, x: jnp.ndarray) -> jnp.ndarray:
    nch = A.w0.shape[0]
    x2d = _x_plane(A, x, A.vals.dtype)
    rows = A.w0[:, None] + jnp.arange(SUB, dtype=A.w0.dtype)[None, :]
    wins3 = x2d.at[rows].get(mode="promise_in_bounds")     # (nch, 8, 128)
    w = A.word.reshape(nch, SUB, LANES)
    s_loc = jnp.arange(SUB, dtype=jnp.int32)[None, :, None]
    wsel = (((w >> 7) & 0x7) + s_loc) % SUB
    cidx = jnp.broadcast_to(
        jnp.arange(nch, dtype=jnp.int32)[:, None, None], w.shape)
    g = wins3[cidx, wsel, w & 0x7F]
    v = g * A.vals.reshape(nch, SUB, LANES)
    for k in range(_SCAN_STAGES):
        guard = ((w >> (10 + k)) & 1) != 0
        v = v + jnp.where(guard, jnp.roll(v, 1 << k, axis=2), 0.0)
    E = jnp.take_along_axis(v, (w >> 17) & 0x7F, axis=2)
    z = jnp.where(((w >> 24) & 1) != 0, E, 0.0)
    return _combine_y(A, z.sum(axis=1))


def _sellw_kernel(nB, w0_ref, word_ref, val_ref, x2d_ref, o_ref, wins_ref):
    """One grid step: nB chunks, all stages batched over (8·nB, 128)."""
    i = pl.program_id(0)

    def fill(j, _):
        w0 = w0_ref[i * nB + j]
        wins_ref[pl.ds(j * SUB, SUB), :] = x2d_ref[pl.ds(w0, SUB), :]
        return 0

    jax.lax.fori_loop(0, nB, fill, 0, unroll=True)
    w = word_ref[:]
    wins = wins_ref[:]
    R = wins.shape[0]
    b = w & 0x7F
    rot = (w >> 7) & 0x7
    s_in_blk = jax.lax.broadcasted_iota(jnp.int32, wins.shape, 0) % SUB
    acc = jnp.where(rot == 0, jnp.take_along_axis(wins, b, axis=1), 0.0)
    for r in range(1, SUB):
        lo = pltpu.roll(wins, (R - r) % R, 0)
        hi = pltpu.roll(wins, (R - r + SUB) % R, 0)
        rotv = jnp.where(s_in_blk < SUB - r, lo, hi)   # groupwise roll by +r
        acc = jnp.where(rot == r, jnp.take_along_axis(rotv, b, axis=1), acc)
    v = acc * val_ref[:]
    for k in range(_SCAN_STAGES):
        guard = ((w >> (10 + k)) & 1) != 0
        v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
    E = jnp.take_along_axis(v, (w >> 17) & 0x7F, axis=1)
    z = jnp.where(((w >> 24) & 1) != 0, E, 0.0)
    o_ref[:] = jnp.sum(z.reshape(nB, SUB, LANES), axis=1)


@register_spmv("SELLW", "pallas")
def spmv_sellw_pallas(A: SellW, x: jnp.ndarray) -> jnp.ndarray:
    nch = A.w0.shape[0]
    nB = min(CHUNK_PAD, nch)
    x2d = _x_plane(A, x, A.vals.dtype)
    interpret = jax.default_backend() not in ("tpu",)
    blk = lambda i: (i, 0)  # noqa: E731
    out = pl.pallas_call(
        partial(_sellw_kernel, nB),
        out_shape=jax.ShapeDtypeStruct((nch, LANES), A.vals.dtype),
        grid=(nch // nB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nB * SUB, LANES), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((nB * SUB, LANES), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((A.x_rows, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nB, LANES), blk, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nB * SUB, LANES), A.vals.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(A.w0, A.word, A.vals, x2d)
    return _combine_y(A, out)


def execute_sellw_numpy(A: SellW, x: np.ndarray) -> np.ndarray:
    """float64 host reference of the compiled program (program semantics)."""
    nch = int(A.w0.shape[0])
    x2d = np.zeros(A.x_rows * LANES)
    x2d[: x.shape[0]] = x
    x2d = x2d.reshape(A.x_rows, LANES)
    w = np.asarray(A.word).view(np.uint32).reshape(nch, SUB, LANES)
    w0 = np.asarray(A.w0)
    wins3 = x2d[(w0[:, None] + np.arange(SUB))]
    s_loc = np.arange(SUB)[None, :, None]
    wsel = (((w >> 7) & 0x7).astype(np.int64) + s_loc) % SUB
    cidx = np.broadcast_to(np.arange(nch)[:, None, None], w.shape)
    g = wins3[cidx, wsel, (w & 0x7F).astype(np.int64)]
    v = g * np.asarray(A.vals).astype(np.float64).reshape(nch, SUB, LANES)
    for k in range(_SCAN_STAGES):
        guard = ((w >> (10 + k)) & 1) != 0
        v = v + np.where(guard, np.roll(v, 1 << k, axis=2), 0.0)
    E = np.take_along_axis(v, ((w >> 17) & 0x7F).astype(np.int64), axis=2)
    z = np.where(((w >> 24) & 1) != 0, E, 0.0)
    out = z.sum(axis=1)
    outp = np.concatenate([out, np.zeros((1, LANES))], axis=0)
    y2 = outp[np.asarray(A.yidx)].sum(axis=0)
    return y2.reshape(-1)[: A.m]
