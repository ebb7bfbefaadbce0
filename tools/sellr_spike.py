#!/usr/bin/env python
"""Spike: validate the SELLR v3 kernel structure on synthetic planes.

Pieces under test (before writing the real builder):
  * output ref as cross-step VMEM y accumulator (constant index_map),
  * per-chunk dynamic-offset accumulate into it,
  * masked sublane rolls (dist placement) on the (512,128) step plane,
  * per-step @pl.when gating of scan stages / rolls,
  * per-chunk (8,128) slice fill from a VMEM-resident x plane.
Measures Gslot/s on a 24576-chunk plane.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

SUB, LANES = 8, 128
NCH = 24576
NB = 64                  # chunks per grid step
X_ROWS = 1664            # x plane rows (213k x entries)
Y_ROWS = 1664
NSTEPS = NCH // NB
STAGES = 7               # word supports up to 7; gated per step


def measure_raw(fn, *args, k_lo=4, k_hi=24, reps=7):
    def chain(k):
        @jax.jit
        def c(x, *rest):
            def body(_, v):
                return fn(v, *rest)
            return jnp.sum(jax.lax.fori_loop(0, k, body, x)[:8])
        return c
    lo, hi = chain(k_lo), chain(k_hi)
    for _ in range(2):
        float(np.asarray(lo(*args)))
        float(np.asarray(hi(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(lo(*args)))
        tl = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(hi(*args)))
        th = time.perf_counter() - t0
        ts.append((th - tl) / (k_hi - k_lo))
    return float(np.median(ts))


def make_kernel(nrolls_active, smax_static, slice_fill, wrap_rolls=True, yacc=True):
    """SELLR step kernel; nrolls_active / smax_static emulate per-step
    gating outcomes (what a banded matrix would trigger)."""

    def kernel(meta_ref, word_ref, val_ref, x2d_ref, y_ref, wins_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        # --- fill ---
        if slice_fill:
            def fill(c, _):
                xw = meta_ref[c, 0]
                wins_ref[pl.ds(c * SUB, SUB), :] = x2d_ref[pl.ds(xw, SUB), :]
                return 0
            jax.lax.fori_loop(0, NB, fill, 0, unroll=True)
        else:
            def fill(j, _):
                xw = meta_ref[j // SUB, 0] + j % SUB
                wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(xw, 1), :]
                return 0
            jax.lax.fori_loop(0, NB * SUB, fill, 0, unroll=True)

        w = word_ref[:]
        v = jnp.take_along_axis(wins_ref[:], w & 0x7F, axis=1) * val_ref[:]
        # --- scan, per-step gated (here: static smax to measure the cost) ---
        for k in range(smax_static):
            guard = ((w >> (7 + k)) & 1) != 0
            v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
        # --- extract at target lanes ---
        E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
        live = ((w >> 21) & 1) != 0
        P = jnp.where(live, E, 0.0)
        # --- dist placement: masked sublane rolls ---
        dist = (w >> 22) & 0x7
        R = jnp.where(dist == 0, P, 0.0)
        if wrap_rolls:
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (NB * SUB, LANES),
                                                0) % SUB
            for r in range(1, nrolls_active + 1):
                up = jnp.where((dist == r) & (sub_iota < SUB - r), P, 0.0)
                R = R + pltpu.roll(up, r, 0)
                dn = jnp.where((dist == r) & (sub_iota >= SUB - r), P, 0.0)
                R = R + pltpu.roll(dn, NB * SUB - (SUB - r), 0)
        else:
            for r in range(1, nrolls_active + 1):
                up = jnp.where(dist == r, P, 0.0)
                R = R + pltpu.roll(up, r, 0)
        # --- y accumulate: per-chunk dynamic-offset add ---
        if yacc:
            wins_ref[:] = R          # reuse scratch so pl.ds slicing applies
            def acc(c, _):
                yb = meta_ref[c, 1]
                y_ref[pl.ds(yb, SUB), :] = (y_ref[pl.ds(yb, SUB), :]
                                            + wins_ref[pl.ds(c * SUB, SUB), :])
                return 0
            jax.lax.fori_loop(0, NB, acc, 0, unroll=True)
        else:
            y_ref[0:SUB, :] = y_ref[0:SUB, :] + R[0:SUB, :]

    return kernel


def main():
    rng = np.random.default_rng(0)
    word = jnp.asarray(rng.integers(0, 2**25, size=(NCH * SUB, LANES),
                                    dtype=np.int64).astype(np.int32))
    vals = jnp.asarray(rng.random((NCH * SUB, LANES), dtype=np.float32))
    meta_np = np.zeros((NCH, 2), np.int32)
    meta_np[:, 0] = rng.integers(0, X_ROWS - SUB, NCH)
    meta_np[:, 1] = rng.integers(0, Y_ROWS // SUB, NCH) * SUB
    meta = jnp.asarray(meta_np)
    x2d = jnp.asarray(rng.random((X_ROWS, LANES), dtype=np.float32))

    in_bytes = NCH * SUB * LANES * 8
    slots = NCH * SUB * LANES
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((NB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((NB, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec((X_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((Y_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    def bench(name, nrolls, smax, slice_fill, wrap_rolls=True, yacc=True):
        k = make_kernel(nrolls, smax, slice_fill, wrap_rolls, yacc)

        def f(v, w, mt, x):
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((Y_ROWS, LANES),
                                                  jnp.float32),
                grid=(NSTEPS,),
                in_specs=[sspec, vspec, vspec, xspec], out_specs=yspec,
                scratch_shapes=[pltpu.VMEM((NB * SUB, LANES), jnp.float32)],
                compiler_params=params)(mt, w, v, x)

        # carry = x2d (832 KB -> negligible fold-back pollution)
        def g(x, v, w, mt):
            y = f(v, w, mt, x)
            return x * (1.0 + y[0, 0] * 1e-37)

        t = measure_raw(g, x2d, vals, word, meta)
        print(f"{name:<52} t={t*1e6:8.1f} us  {slots/t/1e9:6.1f} Gslot/s")

    bench("SELLR banded (rolls=2 wrap, smax=3)", 2, 3, True)
    bench("SELLR banded up-only rolls", 2, 3, True, wrap_rolls=False)
    bench("SELLR banded up-only, no y-acc", 2, 3, True, wrap_rolls=False, yacc=False)
    bench("SELLR rolls=0 smax=2 no y-acc", 0, 2, True, yacc=False)
    bench("SELLR worst (rolls=7 wrap, smax=7)", 7, 7, True)





MXU_MODE = 'default'


def mxu_variant():
    global MXU_MODE
    """MXU one-hot scatter variant: per step, S2 (GW*8, NB*SUB) one-hot maps
    (chunk,sublane) rows to target y rows; one contiguous RMW per step."""
    rng = np.random.default_rng(1)
    GW = 16
    word = jnp.asarray(rng.integers(0, 2**22, size=(NCH * SUB, LANES),
                                    dtype=np.int64).astype(np.int32))
    vals = jnp.asarray(rng.random((NCH * SUB, LANES), dtype=np.float32))
    # meta per sublane: [wrow, trel] ; per chunk: bcast flag; per step: ybase
    wrow_np = rng.integers(0, X_ROWS, NCH * SUB).astype(np.int32)
    trel_np = rng.integers(0, GW * SUB, NCH * SUB).astype(np.int32)
    ybase_np = (rng.integers(0, Y_ROWS // SUB - GW, NSTEPS) * SUB).astype(np.int32)
    yb_col = np.repeat(ybase_np, NB * SUB).astype(np.int32)
    sub_meta = jnp.asarray(np.stack([wrow_np, yb_col], 1))
    trel = jnp.asarray(np.broadcast_to(
        trel_np.reshape(NSTEPS, 1, NB * SUB), (NSTEPS, 8, NB * SUB)).copy())
    x2d = jnp.asarray(rng.random((X_ROWS, LANES), dtype=np.float32))

    slots = NCH * SUB * LANES
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((NB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((NB * SUB, 2), blk, memory_space=pltpu.SMEM)
    tspec = pl.BlockSpec((1, 8, NB * SUB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((X_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((Y_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    def kernel(meta_ref, trel_ref, word_ref, val_ref, x2d_ref, y_ref,
               wins_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)

        def fill(j, _):
            wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(meta_ref[j, 0], 1), :]
            return 0
        jax.lax.fori_loop(0, NB * SUB, fill, 0, unroll=True)

        w = word_ref[:]
        v = jnp.take_along_axis(wins_ref[:], w & 0x7F, axis=1) * val_ref[:]
        for k in range(3):
            guard = ((w >> (7 + k)) & 1) != 0
            v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
        E = jnp.take_along_axis(v, (w >> 14) & 0x7F, axis=1)
        P = jnp.where(((w >> 21) & 1) != 0, E, 0.0)
        # S2: (GW*8, NB*SUB) one-hot, proper matmul orientation
        t = trel_ref[0, 0:1, :]                       # (1, 512)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (GW * SUB, NB * SUB), 0)
        S2 = (t == tgt).astype(jnp.float32)
        if MXU_MODE == "no_mxu":
            Z = P[0:GW * SUB, :]
        elif MXU_MODE == "const_s2":
            S2c = jax.lax.broadcasted_iota(
                jnp.int32, (GW * SUB, NB * SUB), 0).astype(jnp.float32) * 1e-30
            Z = jnp.dot(S2c, P, preferred_element_type=jnp.float32)
        elif MXU_MODE == "no_s2_build":
            Z = jnp.dot(jnp.zeros((GW * SUB, NB * SUB), jnp.float32) + 1.0,
                        P, preferred_element_type=jnp.float32)
        elif MXU_MODE == "highest":
            Z = jnp.dot(S2, P, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        elif MXU_MODE == "split3":
            P1 = (P.astype(jnp.bfloat16)).astype(jnp.float32)
            r1 = P - P1
            P2 = (r1.astype(jnp.bfloat16)).astype(jnp.float32)
            P3 = r1 - P2
            Z = (jnp.dot(S2, P1, preferred_element_type=jnp.float32)
                 + jnp.dot(S2, P2, preferred_element_type=jnp.float32)
                 + jnp.dot(S2, P3, preferred_element_type=jnp.float32))
        else:
            Z = jnp.dot(S2, P, preferred_element_type=jnp.float32)
        yb = meta_ref[0, 1]
        y_ref[pl.ds(yb, GW * SUB), :] = y_ref[pl.ds(yb, GW * SUB), :] + Z

    def f(v, w, mt, x):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((Y_ROWS, LANES),
                                                   jnp.float32),
            grid=(NSTEPS,),
            in_specs=[mspec, tspec, vspec, vspec, xspec], out_specs=yspec,
            scratch_shapes=[pltpu.VMEM((NB * SUB, LANES), jnp.float32)],
            compiler_params=params)(mt, trel, w, v, x)

    def g(x, v, w, mt):
        y = f(v, w, mt, x)
        return x * (1.0 + y[0, 0] * 1e-37)

    t = measure_raw(g, x2d, vals, word, sub_meta)
    print(f"{'SELLR MXU-scatter (smax=3, row-fill)':<52} t={t*1e6:8.1f} us  "
          f"{slots/t/1e9:6.1f} Gslot/s")

    if MXU_MODE in ("no_mxu", "const_s2", "no_s2_build"):
        return
    # numerical check vs numpy emulation
    y = np.asarray(jax.block_until_ready(f(vals, word, sub_meta, x2d)))
    wn = np.asarray(word).view(np.uint32)
    wins = np.asarray(x2d)[wrow_np]
    v = np.take_along_axis(wins, (wn & 0x7F).astype(np.int64), 1) * np.asarray(vals)
    for k in range(3):
        guard = ((wn >> (7 + k)) & 1) != 0
        v = v + np.where(guard, np.roll(v, 1 << k, 1), 0.0)
    E = np.take_along_axis(v, ((wn >> 14) & 0x7F).astype(np.int64), 1)
    P = np.where(((wn >> 21) & 1) != 0, E, 0.0)
    yref = np.zeros((Y_ROWS, LANES), np.float64)
    for i in range(NSTEPS):
        Z = np.zeros((GW * SUB, LANES))
        for j in range(NB * SUB):
            Z[trel_np[i * NB * SUB + j]] += P[i * NB * SUB + j]
        yref[ybase_np[i]:ybase_np[i] + GW * SUB] += Z
    err = np.abs(y - yref).max() / max(np.abs(yref).max(), 1e-30)
    print(f"  max rel err vs numpy: {err:.2e}")


main_orig = main


if __name__ == "__main__":
    import sys as _s
    for _m in ("no_mxu", "const_s2", "no_s2_build", "default", "split3"):
        globals()["MXU_MODE"] = _m
        print("MODE:", _m)
        mxu_variant()
