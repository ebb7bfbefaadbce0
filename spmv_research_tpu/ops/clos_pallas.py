"""Pallas TPU executor for the CLOS routed SpMV.

Each in-vreg layer is three vreg-shuffle passes (lane-pick via
``tpu.dynamic_gather`` / take_along_axis(axis=1), sublane-pick via 7
within-vreg rotations built from ``pltpu.roll`` + selects — both measured
~215 G elem/s batched); the (V,1024) transposes run inside the kernel
(reshape+transpose+reshape ≈ 7 us at N=2^20). Shuffle indices arrive as one
packed int32 word per slot (see ``clos.Clos``) and are extracted with
shift+mask — a separate int8-plane encoding costs an int8→int32 vreg
relayout per pick, which dominates runtime.

The pipeline is fused into three pallas calls — one per network, with the
fill / value-multiply / segmented-scan / validity stages folded in.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clos import Clos, LANE2_SHIFT, ROT_SHIFT, SPARE_BITS, SPARE_SHIFT
from .clos_route import BLK, LANES, SUB
from .dispatch import register_spmv
from .bfly_pallas import _flat_shift, _call


def _invreg_ops(v, word):
    """One in-vreg layer on the value array (packed-word planes)."""
    S = v.shape[0]
    t1 = jnp.take_along_axis(v, word & 0x7F, axis=1)
    rot = (word >> ROT_SHIFT) & 0x7
    s_in_blk = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) % SUB
    acc = jnp.where(rot == 0, t1, 0.0)
    for r in range(1, SUB):
        lo = pltpu.roll(t1, (S - r) % S, 0)
        hi = pltpu.roll(t1, (S - r + SUB) % S, 0)
        rotv = jnp.where(s_in_blk < SUB - r, lo, hi)
        acc = jnp.where(rot == r, rotv, acc)
    return jnp.take_along_axis(acc, (word >> LANE2_SHIFT) & 0x7F, axis=1)


def _stage_bit(k, w3, hi_ref):
    if k < SPARE_BITS:
        return ((w3 >> (SPARE_SHIFT + k)) & 1) != 0
    return ((hi_ref[:] >> (k - SPARE_BITS)) & 1) != 0


def _invreg_kernel(v_ref, p_ref, o_ref):
    o_ref[:] = _invreg_ops(v_ref[:], p_ref[:])


_STREAM_BLK = 1024  # sublane rows per grid step (8 MB VMEM live, 2 buffers)


def _call_gridded(kernel_fn, v, *arrays):
    """Gridded, double-buffered pallas call for per-slot kernels (the
    in-vreg layers): Pallas streams (blk,128) blocks of every operand
    HBM→VMEM while the previous block computes — the copy/compute-overlap
    role of the reference's CUDA stream variants (GPU_clean/*_stream.cu).
    Measured ~9% over the whole-array call at N=2^20 (10.8→9.8 us/layer).
    Only valid for kernels whose slots don't cross block rows (invreg
    layers; NOT the scan/fill kernels, whose shifts span the array)."""
    interpret = jax.default_backend() not in ("tpu",)
    S = v.shape[0]
    if interpret or S % _STREAM_BLK or S == _STREAM_BLK:
        return _call(kernel_fn, v, *arrays)
    spec = pl.BlockSpec((_STREAM_BLK, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
        grid=(S // _STREAM_BLK,),
        in_specs=[spec] * (1 + len(arrays)),
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(v, *arrays)


def _r3_fill_kernel(meta, v_ref, p_ref, hi_ref, o_ref):
    """r3 layer + forward-fill stages (take bits in p's spare bits)."""
    S, fill_stages = meta
    w3 = p_ref[:]
    v = _invreg_ops(v_ref[:], w3)
    for k in fill_stages:
        take = _stage_bit(k, w3, hi_ref)
        v = jnp.where(take, _flat_shift(v, 1 << k, S), v)
    o_ref[:] = v


def _r3_scan_kernel(meta, v_ref, p_ref, vals_ref, hi_ref, o_ref):
    """r3 layer + value multiply + segmented scan (guards in spare bits)."""
    S, scan_stages = meta
    w3 = p_ref[:]
    v = _invreg_ops(v_ref[:], w3) * vals_ref[:]
    for k in scan_stages:
        guard = _stage_bit(k, w3, hi_ref)
        v = v + jnp.where(guard, _flat_shift(v, 1 << k, S), 0.0)
    o_ref[:] = v


def _r3_scan_kernel_noval(meta, v_ref, p_ref, hi_ref, o_ref):
    """r3 layer + segmented scan (values already multiplied upstream)."""
    S, scan_stages = meta
    w3 = p_ref[:]
    v = _invreg_ops(v_ref[:], w3)
    for k in scan_stages:
        guard = _stage_bit(k, w3, hi_ref)
        v = v + jnp.where(guard, _flat_shift(v, 1 << k, S), 0.0)
    o_ref[:] = v


def _r3_scan_yext_kernel(meta, v_ref, p_ref, hi_ref, ysel_ref, wstart_ref,
                         border_ref, y_ref, scr_ref):
    """r3 layer + segmented scan + fused y extraction.

    Writes y (m_rows_pad, 128) directly instead of materializing the scanned
    v to HBM and row-gathering C candidate planes (the former back end cost
    ~44 us of the 135 us pipeline at N=2^20 — 2×C×0.7 MB of HBM plus C
    lane-picks). The scanned v lands in a VMEM scratch; each y row (group of
    128 matrix rows) reads dynamic (8,128) sublane windows at its prefetched
    start ``wstart[g]`` (end slots are monotone in the row, so a group's
    end-slot v-rows span ≤ 8·w_g rows) and resolves each y slot with one
    lane-pick + one 8-deep sublane-pick per window octave. The picks are
    broadcast per group (one y row at a time): a per-slot two-stage pick
    cannot compose — the 8-deep sublane pick indexes by (sublane, source
    lane), so two slots of one y row wanting the same source lane from
    different window rows would conflict. Batches of 8 groups are processed
    sorted by octave class (``border``/``classes``) so the common case
    (span ≤ 8) does exactly one window's work. Empty rows carry bit 14 of
    ``ysel`` and are masked to zero (they read no slot at all)."""
    S, scan_stages, classes = meta
    w3 = p_ref[:]
    v = _invreg_ops(v_ref[:], w3)
    for k in scan_stages:
        guard = _stage_bit(k, w3, hi_ref)
        v = v + jnp.where(guard, _flat_shift(v, 1 << k, S), 0.0)
    scr_ref[:] = v
    iota0 = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)

    def make_batch(W, accum):
        def batch(i, base):
            b = border_ref[base + i]
            bs = b & 0xFFFF            # group-record (read) batch id
            bd = b >> 16               # y (write) batch id
            sel = ysel_ref[pl.ds(bs * SUB, SUB), :]
            lam = sel & 0x7F
            cid = (sel >> 7) & 0x1FF
            emptyb = ((sel >> 16) & 1) != 0
            y8 = jnp.zeros((SUB, LANES), y_ref.dtype)
            for g in range(SUB):
                ws = wstart_ref[bs * SUB + g]
                lam_g = jnp.broadcast_to(lam[g:g + 1, :], (SUB, LANES))
                cid_g = jnp.broadcast_to(cid[g:g + 1, :], (SUB, LANES))
                row = jnp.zeros((SUB, LANES), y_ref.dtype)
                for k in range(W):
                    win = scr_ref[pl.ds(ws + k * SUB, SUB), :]
                    t = jnp.take_along_axis(win, lam_g, axis=1)
                    if W > 1:
                        r = jnp.take_along_axis(
                            t, jnp.clip(cid_g - k * SUB, 0, SUB - 1),
                            axis=0)
                        row = jnp.where((cid_g >> 3) == k, r, row)
                    else:
                        row = jnp.take_along_axis(t, cid_g, axis=0)
                y8 = jnp.where(iota0 == g, row, y8)
            out = jnp.where(emptyb, 0.0, y8)
            if accum:   # extra picks (capped scan): add into written y rows
                out = out + y_ref[pl.ds(bd * SUB, SUB), :]
            y_ref[pl.ds(bd * SUB, SUB), :] = out
            return base
        return batch

    for W, base, count, accum in classes:
        jax.lax.fori_loop(0, count, make_batch(W, accum), base)


def _r3_valid_kernel(v_ref, p_ref, o_ref):
    """r3 layer + out-valid mask (bit 17 of the word)."""
    w3 = p_ref[:]
    v = _invreg_ops(v_ref[:], w3)
    o_ref[:] = jnp.where(((w3 >> SPARE_SHIFT) & 1) != 0, v, 0.0)


def _t_fwd(v, V):
    return jnp.transpose(v.reshape(V, BLK)).reshape(SUB * BLK, V // SUB)


def _t_bwd(v, V):
    return jnp.transpose(v.reshape(BLK, V)).reshape(SUB * V, LANES)


def _net(v, r1, r2, r3_call, V):
    """One Clos network: per-layer pallas calls, XLA transposes between
    (measured: fusing layers or transposes into one kernel is *slower* —
    Mosaic schedules the small kernels better and XLA's relayout-transpose
    beats the in-kernel reshape+transpose)."""
    v = _call_gridded(_invreg_kernel, v, r1)
    v = _t_fwd(v, V)
    v = _call_gridded(_invreg_kernel, v, r2)
    v = _t_bwd(v, V)
    return r3_call(v)


@register_spmv("CLOS", "pallas")
def spmv_clos_pallas(A: Clos, x: jnp.ndarray) -> jnp.ndarray:
    N, V = A.N, A.V
    S = SUB * V
    v = jnp.pad(x.astype(A.vals.dtype), (0, N - x.shape[0]))
    v = v.reshape(S, LANES)
    v = _net(v, A.widen_r1, A.widen_r2,
             lambda u: _call(partial(_r3_fill_kernel, (S, A.fill_stages)),
                             u, A.widen_r3, A.fill_hi), V)
    v = _net(v, A.perm_r1, A.perm_r2,
             lambda u: _call(partial(_r3_scan_kernel, (S, A.scan_stages)),
                             u, A.perm_r3, A.vals, A.scan_hi), V)
    v = _net(v, A.compact_r1, A.compact_r2,
             lambda u: _call(_r3_valid_kernel, u, A.compact_r3), V)
    return v.reshape(-1)[: A.m]
