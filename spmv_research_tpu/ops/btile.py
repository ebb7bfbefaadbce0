"""BTILE: dense-(8,128)-tile MXU engine for SpMM and SDDMM.

The reference treats the K dimension as a first-class sweep
(``benchmark_code/BENCH/config.sh:138-143``, K=16-256) but its SpMM is a stub
(``bench_spmm.cpp:268-280`` still calls spmv) and its SDDMM kernels are
VPU-style dot loops (``sddmm_kernels/csr.cpp:109-135``).  On TPU the K
dimension is *the* MXU opportunity: sparse A is packed into dense (8,128)
tiles and every tile becomes one row-slab of a large matmul, so the A plane
is streamed once per K-block instead of once per column (the round-1 CLOSG
SpMM was a ``lax.scan`` of K SpMVs — K× the SpMV cost; VERDICT r2 item 5).

Layout
------
* tile (8,128) at (rowblock rb = row>>3, colblock cb = col>>7); only
  nonempty tiles are stored, as dense fp32 slabs.
* row-band g = 1024 rows (128 rowblocks).  Y's (1024, K) band block stays
  VMEM-resident across all steps of its band and is written to HBM once.
* step = up to TG tiles sharing one (g, cb); steps sorted g-major.

SpMM kernel (one grid step)
---------------------------
``P = tiles (TG*8,128) @ X[cb] (128,K)`` on the MXU, then placement into the
band accumulator with a transposed one-hot matmul
``Y[g] += S (1024, TG*8) @ P`` — also MXU, no serialized scatter (the
round-2 SELLR spikes measured 64 chained dynamic RMWs at half the kernel
time).  ``X[cb]`` is fetched via a scalar-prefetched index map, so
consecutive steps on one column block reuse the VMEM copy.

SDDMM kernel: ``C_tile = (S_onehot^T? -- see _btile_sddmm_kernel)``
gathers the band's A rows with the same one-hot trick, multiplies against
``B[cb]^T`` on the MXU and masks with the tile pattern.

Applicability: tile fill ≥ ``1/max_slots_per_nnz`` (scattered matrices
degenerate to 1 nnz/tile — they route to the gather engines instead).
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
from .dispatch import register_spmm, register_sddmm
from .clos import _register

TILE_R = 8
TILE_C = 128
BAND = 1024                  # rows per band (= 128 rowblocks)
RB_PER_BAND = BAND // TILE_R


class BTileBuildError(ValueError):
    pass


@partial(_register, data_fields=("tiles", "patt", "tgt", "step_g", "step_cb",
                                 "step_t0", "step_nt", "tile_rb", "tile_cb"),
         meta_fields=("shape", "nnz", "nnz_expanded", "ntiles", "nsteps",
                      "tg", "ngroups", "ncb"))
@dataclasses.dataclass(frozen=True)
class BTile:
    tiles: jnp.ndarray    # (nsteps*TG*8, 128) fp32 dense tile slabs
    patt: jnp.ndarray     # (nsteps*TG*8, 128) int8 structural pattern (1 at
                          # stored nnz, incl. explicit zeros — ADVICE r2 #4)
    tgt: jnp.ndarray      # (nsteps, TG*8) int32 local target row in band
    step_g: jnp.ndarray   # (nsteps,) int32 band of each step
    step_cb: jnp.ndarray  # (nsteps,) int32 column block of each step
    step_t0: jnp.ndarray  # (nsteps,) int32 first tile id of the step
    step_nt: jnp.ndarray  # (nsteps,) int32 live tile count of the step
    tile_rb: jnp.ndarray  # (ntiles,) int32 global rowblock (XLA/gold path)
    tile_cb: jnp.ndarray  # (ntiles,) int32 global colblock (XLA/gold path)
    shape: Tuple[int, int]
    nnz: int
    nnz_expanded: int
    ntiles: int
    nsteps: int
    tg: int               # tiles per step
    ngroups: int          # row bands
    ncb: int              # column blocks

    format_name = "BTILE"

    @property
    def m(self):
        return self.shape[0]

    @property
    def n(self):
        return self.shape[1]

    def mem_footprint_bytes(self) -> int:
        return int(self.tiles.size * self.tiles.dtype.itemsize
                   + self.patt.size + self.tgt.size * 4
                   + self.step_g.size * 16 + self.tile_rb.size * 8)


def build_btile(csr: HostCSR, dtype=jnp.float32, tg: int = 32,
                max_slots_per_nnz: float = 64.0) -> BTile:
    """Compile host CSR into a BTILE program.

    Raises :class:`BTileBuildError` when tile fill is too low (slots/nnz
    above ``max_slots_per_nnz``) — the tile stream would be HBM-wasteful.
    """
    dt = np.dtype(dtype)
    m, n, nnz = csr.m, csr.n, csr.nnz
    if m == 0 or nnz == 0:
        raise BTileBuildError("empty matrix")
    ia = csr.ia.astype(np.int64)
    ja = csr.ja.astype(np.int64)
    rows = np.repeat(np.arange(m, dtype=np.int64),
                     np.diff(ia).astype(np.int64))
    rb = rows >> 3
    cb = ja >> 7
    g = rows >> 10
    ngroups = (m + BAND - 1) // BAND
    ncb = max((n + TILE_C - 1) // TILE_C, 1)

    key = (g * ncb + cb) * (1 + ((m - 1) >> 3)) + rb   # g-major, cb, rb
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    first = np.ones(nnz, bool)
    first[1:] = key_s[1:] != key_s[:-1]
    tile_of_sorted = np.cumsum(first) - 1
    ntiles = int(tile_of_sorted[-1]) + 1
    if ntiles * (TILE_R * TILE_C) > max_slots_per_nnz * nnz:
        raise BTileBuildError(
            f"{ntiles * TILE_R * TILE_C / nnz:.0f} slots/nnz "
            "(tile fill too low — not a BTILE matrix)")

    t_first = np.flatnonzero(first)
    tile_rb = rb[order][t_first]
    tile_cb = cb[order][t_first]
    tile_g = g[order][t_first]

    # dense tile slabs + structural pattern (explicit-zero values must not
    # change tile liveness or the SDDMM mask — ADVICE r2 #4)
    tiles = np.zeros((ntiles, TILE_R, TILE_C), dt)
    tiles[tile_of_sorted, rows[order] & 7, ja[order] & 127] = \
        csr.a[order].astype(dt)
    patt = np.zeros((ntiles, TILE_R, TILE_C), np.int8)
    patt[tile_of_sorted, rows[order] & 7, ja[order] & 127] = 1

    # steps: split each (g, cb) run into ceil(run/TG) steps
    run_key = tile_g * ncb + tile_cb
    run_first = np.ones(ntiles, bool)
    run_first[1:] = run_key[1:] != run_key[:-1]
    run_starts = np.flatnonzero(run_first)
    run_ends = np.append(run_starts[1:], ntiles)

    step_g_l, step_cb_l, step_tiles_l = [], [], []
    for s, e in zip(run_starts, run_ends):
        for t0 in range(s, e, tg):
            step_g_l.append(int(tile_g[s]))
            step_cb_l.append(int(tile_cb[s]))
            step_tiles_l.append((t0, min(t0 + tg, e)))
    # every band needs >= 1 step (unvisited out blocks stay garbage)
    present = np.zeros(ngroups, bool)
    present[np.array(step_g_l, np.int64)] = True
    for gg in np.flatnonzero(~present):
        step_g_l.append(int(gg))
        step_cb_l.append(0)
        step_tiles_l.append((0, 0))
    o = np.argsort(np.array(step_g_l), kind="stable")   # keep g-major
    step_g_a = np.array(step_g_l, np.int32)[o]
    step_cb_a = np.array(step_cb_l, np.int32)[o]
    step_tiles_l = [step_tiles_l[i] for i in o]

    nsteps = len(step_tiles_l)
    tiles_p = np.zeros((nsteps, tg, TILE_R, TILE_C), dt)
    patt_p = np.zeros((nsteps, tg, TILE_R, TILE_C), np.int8)
    tgt = np.zeros((nsteps, tg * TILE_R), np.int32)
    step_t0 = np.zeros(nsteps, np.int32)
    step_nt = np.zeros(nsteps, np.int32)
    for i, (t0, t1) in enumerate(step_tiles_l):
        k = t1 - t0
        step_t0[i], step_nt[i] = t0, k
        if k == 0:
            continue
        tiles_p[i, :k] = tiles[t0:t1]
        patt_p[i, :k] = patt[t0:t1]
        loc = (tile_rb[t0:t1] - step_g_a[i] * RB_PER_BAND).astype(np.int32)
        tgt[i, : k * TILE_R] = (np.repeat(loc, TILE_R) * TILE_R
                                + np.tile(np.arange(TILE_R,
                                                    dtype=np.int32), k))

    return BTile(
        tiles=jnp.asarray(tiles_p.reshape(nsteps * tg * TILE_R, TILE_C)),
        patt=jnp.asarray(patt_p.reshape(nsteps * tg * TILE_R, TILE_C)),
        tgt=jnp.asarray(tgt),
        step_g=jnp.asarray(step_g_a),
        step_cb=jnp.asarray(step_cb_a),
        step_t0=jnp.asarray(step_t0),
        step_nt=jnp.asarray(step_nt),
        tile_rb=jnp.asarray(tile_rb.astype(np.int32)),
        tile_cb=jnp.asarray(tile_cb.astype(np.int32)),
        shape=(m, n), nnz=nnz, nnz_expanded=csr.nnz_expanded,
        ntiles=ntiles, nsteps=nsteps, tg=tg, ngroups=ngroups, ncb=ncb)


# ---------------------------------------------------------------- SpMM

def _x_blocks(A: BTile, X: jnp.ndarray, dtype) -> jnp.ndarray:
    n, k = X.shape
    return jnp.pad(X.astype(dtype),
                   ((0, A.ncb * TILE_C - n), (0, 0)))


def _btile_spmm_kernel(tg, sg_ref, scb_ref, tgt_ref, tiles_ref, x_ref,
                       y_ref):
    i = pl.program_id(0)
    prev_g = sg_ref[jnp.maximum(i - 1, 0)]
    fresh = jnp.logical_or(i == 0, sg_ref[i] != prev_g)

    @pl.when(fresh)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    p = jnp.dot(tiles_ref[:], x_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # (TG*8, K)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BAND, tg * TILE_R), 0)
    # tgt is fully VMEM-resident ((1, TG*8) blocks violate the (8,128)
    # tiling rule on real TPUs); slice this step's row in-kernel
    s = (rows == tgt_ref[pl.ds(i, 1), :]).astype(jnp.float32)
    y_ref[:] = y_ref[:] + jnp.dot(
        s, p, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def spmm_btile_pallas_padded(A: BTile, xp: jnp.ndarray) -> jnp.ndarray:
    """xp (ncb*128, K) padded -> y (ngroups*1024, K) padded."""
    k = xp.shape[1]
    tg = A.tg
    interpret = jax.default_backend() not in ("tpu",)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(A.nsteps,),
        in_specs=[
            pl.BlockSpec((A.nsteps, tg * TILE_R),
                         lambda i, sg, scb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg * TILE_R, TILE_C), lambda i, sg, scb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_C, k), lambda i, sg, scb: (scb[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BAND, k), lambda i, sg, scb: (sg[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_btile_spmm_kernel, tg),
        out_shape=jax.ShapeDtypeStruct((A.ngroups * BAND, k), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(A.step_g, A.step_cb, A.tgt, A.tiles, xp)


@register_spmm("BTILE", "pallas")
def spmm_btile_pallas(A: BTile, X: jnp.ndarray) -> jnp.ndarray:
    xp = _x_blocks(A, X, jnp.float32)
    y = spmm_btile_pallas_padded(A, xp)
    return y[: A.m]


@register_spmm("BTILE", "xla")
def spmm_btile_xla(A: BTile, X: jnp.ndarray) -> jnp.ndarray:
    """XLA lowering of the same tile program (correctness reference)."""
    xp = _x_blocks(A, X, jnp.float32)
    k = X.shape[1]
    tiles = A.tiles.reshape(A.nsteps, A.tg, TILE_R, TILE_C)
    xb = xp.reshape(A.ncb, TILE_C, k)
    xg = xb[A.step_cb]                                    # (nsteps, 128, K)
    p = jnp.einsum("stij,sjk->stik", tiles, xg,
                   precision=jax.lax.Precision.HIGHEST)   # (nsteps,TG,8,K)
    # scatter by global row block
    loc_rb = A.tgt.reshape(A.nsteps, A.tg, TILE_R)[:, :, 0] // TILE_R
    grb = A.step_g[:, None] * RB_PER_BAND + loc_rb        # (nsteps, TG)
    nrb = A.ngroups * RB_PER_BAND
    y = jax.ops.segment_sum(
        p.reshape(A.nsteps * A.tg, TILE_R * k),
        grb.reshape(-1), num_segments=nrb)
    return y.reshape(nrb * TILE_R, k)[: A.m]


def execute_btile_numpy(A: BTile, X: np.ndarray) -> np.ndarray:
    """float64 host reference of the compiled program semantics."""
    n, k = X.shape
    xp = np.zeros((A.ncb * TILE_C, k))
    xp[:n] = X
    xb = xp.reshape(A.ncb, TILE_C, k)
    tiles = np.asarray(A.tiles, np.float64).reshape(
        A.nsteps, A.tg, TILE_R, TILE_C)
    y = np.zeros((A.ngroups * BAND, k))
    sg = np.asarray(A.step_g)
    scb = np.asarray(A.step_cb)
    tgt = np.asarray(A.tgt).reshape(A.nsteps, A.tg, TILE_R)
    for i in range(A.nsteps):
        p = tiles[i] @ xb[scb[i]]                 # (TG, 8, K)
        base = sg[i] * BAND
        for t in range(A.tg):
            y[base + tgt[i, t, 0]: base + tgt[i, t, 0] + TILE_R] += p[t]
    return y[: A.m]


# ---------------------------------------------------------------- SDDMM

def _btile_sddmm_kernel(tg, sg_ref, scb_ref, tgt_ref, mask_ref, a_ref,
                        b_ref, c_ref):
    """C_tiles = (A_rows @ B[cb]^T) * mask, per step.

    A band rows (1024, K) are VMEM-resident per band (index_map on sg);
    the step's TG*8 A rows are gathered with the transposed one-hot matmul
    (S^T (TG*8, 1024) @ A_band), then one (TG*8, K)@(K, 128) MXU matmul
    against B's column block produces all TG tiles' dot products at once.
    """
    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BAND, tg * TILE_R), 0)
    s = (rows == tgt_ref[pl.ds(i, 1), :]).astype(jnp.float32)  # (1024,TG*8)
    a_rows = jnp.dot(s.T, a_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)  # (TG*8, K)
    prod = jnp.dot(a_rows, b_ref[:].T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)    # (TG*8, 128)
    c_ref[:] = prod * mask_ref[:]


def sddmm_btile_pallas_padded(A: BTile, ap: jnp.ndarray,
                              bp: jnp.ndarray) -> jnp.ndarray:
    """ap (ngroups*1024, K), bp (ncb*128, K) -> C tile values in the
    (nsteps*TG*8, 128) slab layout (nonzero exactly at A's slots)."""
    k = ap.shape[1]
    tg = A.tg
    interpret = jax.default_backend() not in ("tpu",)
    mask = (A.patt != 0).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(A.nsteps,),
        in_specs=[
            pl.BlockSpec((A.nsteps, tg * TILE_R),
                         lambda i, sg, scb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg * TILE_R, TILE_C), lambda i, sg, scb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BAND, k), lambda i, sg, scb: (sg[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_C, k), lambda i, sg, scb: (scb[i], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tg * TILE_R, TILE_C),
                               lambda i, sg, scb: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_btile_sddmm_kernel, tg),
        out_shape=jax.ShapeDtypeStruct((A.nsteps * tg * TILE_R, TILE_C),
                                       jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(A.step_g, A.step_cb, A.tgt, mask, ap, bp)


@register_sddmm("BTILE", "pallas")
def sddmm_btile_pallas(A: BTile, Am: jnp.ndarray, Bm: jnp.ndarray
                       ) -> jnp.ndarray:
    """C slab values for pattern A from dense Am (m,K), Bm (n,K)."""
    k = Am.shape[1]
    ap = jnp.pad(Am.astype(jnp.float32),
                 ((0, A.ngroups * BAND - Am.shape[0]), (0, 0)))
    bp = jnp.pad(Bm.astype(jnp.float32),
                 ((0, A.ncb * TILE_C - Bm.shape[0]), (0, 0)))
    return sddmm_btile_pallas_padded(A, ap, bp)


@register_sddmm("BTILE", "xla")
def sddmm_btile_xla(A: BTile, Am: jnp.ndarray, Bm: jnp.ndarray
                    ) -> jnp.ndarray:
    k = Am.shape[1]
    ap = jnp.pad(Am.astype(jnp.float32),
                 ((0, A.ngroups * BAND - Am.shape[0]), (0, 0)))
    bp = jnp.pad(Bm.astype(jnp.float32),
                 ((0, A.ncb * TILE_C - Bm.shape[0]), (0, 0)))
    tgt = A.tgt.reshape(A.nsteps, A.tg * TILE_R)
    grow = A.step_g[:, None] * BAND + tgt                 # (nsteps, TG*8)
    a_rows = ap[grow.reshape(-1)]                         # (nsteps*TG*8, K)
    bb = bp.reshape(A.ncb, TILE_C, k)[A.step_cb]          # (nsteps, 128, K)
    prod = jnp.einsum(
        "sik,sjk->sij",
        a_rows.reshape(A.nsteps, A.tg * TILE_R, k), bb,
        precision=jax.lax.Precision.HIGHEST)
    mask = (A.patt != 0).astype(jnp.float32)
    return prod.reshape(A.nsteps * A.tg * TILE_R, TILE_C) * mask


def sddmm_slab_to_csr_values(A: BTile, slab: jnp.ndarray,
                             csr: HostCSR) -> np.ndarray:
    """Extract per-nnz values (CSR order) from the slab layout (host)."""
    sl = np.asarray(slab).reshape(A.nsteps, A.tg, TILE_R, TILE_C)
    # rebuild the nnz -> (step, tile slot, r, c) map exactly as build did
    ia = csr.ia.astype(np.int64)
    ja = csr.ja.astype(np.int64)
    rows = np.repeat(np.arange(csr.m, dtype=np.int64),
                     np.diff(ia).astype(np.int64))
    rb = rows >> 3
    cb = ja >> 7
    g = rows >> 10
    key = (g * A.ncb + cb) * (1 + ((csr.m - 1) >> 3)) + rb
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    first = np.ones(csr.nnz, bool)
    first[1:] = key_s[1:] != key_s[:-1]
    tile_of = np.cumsum(first) - 1
    # tile -> (step, slot): structural, from the build's recorded per-step
    # tile ranges (value-inferred liveness broke on explicit zeros —
    # ADVICE r2 #4)
    t0s = np.asarray(A.step_t0, np.int64)
    nts = np.asarray(A.step_nt, np.int64)
    tile_ids = (np.repeat(t0s, nts)
                + (np.arange(int(nts.sum())) - np.repeat(
                    np.cumsum(nts) - nts, nts)))
    step_of_tile = np.empty(A.ntiles, np.int64)
    slot_of_tile = np.empty(A.ntiles, np.int64)
    step_of_tile[tile_ids] = np.repeat(np.arange(A.nsteps), nts)
    slot_of_tile[tile_ids] = (np.arange(int(nts.sum()))
                              - np.repeat(np.cumsum(nts) - nts, nts))
    out = np.empty(csr.nnz)
    out[order] = sl[step_of_tile[tile_of], slot_of_tile[tile_of],
                    (rows[order] & 7), (ja[order] & 127)]
    return out
