#!/usr/bin/env python
"""SELLRX kernel-shape spike: cost of the scattered-matrix single-pass
engine at scircuit-twin scale (synthetic planes, valid index ranges).

Design under test (round-3): groups of G=8192 rows, sublanes bound to
1024-col windows (8 x2d rows per chunk vreg), two-stage gather
(axis-0 8-deep window-row pick + axis-1 lane pick), segmented lane scan,
eidx pick to target lane, axis-0 placement pick to target sublane
(t mod 8), octet-masked accumulation into a (64,128) group accumulator,
flush to the VMEM-resident y plane per group.

Variants isolate: fill cost, 2nd pick cost, placement-pick vs rolls,
octet-acc cost (loop vs none), scan depth, streaming floor.
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
NB = 64                   # chunks per grid step
NSTEPS = 18
NCH = NB * NSTEPS         # 1152 chunks ~ scircuit at 1.25 slots/nnz
X_ROWS = 1344
Y_ROWS = 1344
GSUB = 64                 # group = 8192 rows = 64 y2d rows
SMEM_BLK = 1024
SLOTS = NCH * SUB * LANES


def measure_raw(fn, *args, k_lo=8, k_hi=136, reps=5):
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


def main():
    rng = np.random.default_rng(1)
    # word plane fields (slot role): c [0,7), u [7,10), guard [10,17),
    # eidx [17,24), emask 24; (target-cell role): src [25,28), rlive 28,
    # oct [29,32)
    c_f = rng.integers(0, 128, (NCH * SUB, LANES)).astype(np.uint32)
    u_f = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    guard = (rng.random((NCH * SUB, LANES, 7)) < 0.35)
    g_f = (guard << np.arange(7)).sum(-1).astype(np.uint32)
    e_f = rng.integers(0, 128, (NCH * SUB, LANES)).astype(np.uint32)
    em_f = (rng.random((NCH * SUB, LANES)) < 0.4).astype(np.uint32)
    src_f = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    rl_f = (rng.random((NCH * SUB, LANES)) < 0.4).astype(np.uint32)
    oct_f = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    word_np = (c_f | (u_f << 7) | (g_f << 10) | (e_f << 17) | (em_f << 24)
               | (src_f << 25) | (rl_f << 28) | (oct_f << 29))
    word = jnp.asarray(word_np.view(np.int32))
    vals = jnp.asarray(rng.random((NCH * SUB, LANES), dtype=np.float32))
    x2d = jnp.asarray(rng.random((X_ROWS, LANES), dtype=np.float32))

    # smeta per step: [0,512) per-sublane wrow (window-row fill source);
    # [512,576) per-chunk meta (ybase<<1|flush); [576] smax
    smeta_np = np.zeros(NSTEPS * SMEM_BLK, np.int32)
    wrow = rng.integers(0, X_ROWS - 8, NCH).astype(np.int32)
    ch = np.arange(NCH)
    ybase = (ch * SUB // (55 * SUB)) * GSUB % (Y_ROWS - GSUB)
    flush = ((ch % 55) == 54).astype(np.int32)
    for i in range(NSTEPS):
        for cc in range(NB):
            c0 = i * NB + cc
            smeta_np[i * SMEM_BLK + cc * SUB: i * SMEM_BLK + cc * SUB + SUB] \
                = wrow[c0] + np.arange(SUB)
            smeta_np[i * SMEM_BLK + NB * SUB + cc] = (ybase[c0] << 1) | flush[c0]
        smeta_np[i * SMEM_BLK + NB * SUB + NB] = 3
    smeta = jnp.asarray(smeta_np)

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((NB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((SMEM_BLK,), lambda i: (i,), memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec((X_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((Y_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    def make(fill_mode, picks, scan_stages, place, acc_mode, octs=8):
        def kernel(smeta_ref, word_ref, val_ref, x2d_ref, y_ref,
                   wins_ref, acc_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                y_ref[:] = jnp.zeros_like(y_ref)
                acc_ref[:] = jnp.zeros_like(acc_ref)

            if fill_mode == "row512":
                def fill(j, _):
                    wr = smeta_ref[j]
                    wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(wr, 1), :]
                    return 0
                jax.lax.fori_loop(0, NB * SUB, fill, 0, unroll=True)
            elif fill_mode == "chunk64":
                def fill(c, _):
                    wr = smeta_ref[c * SUB]
                    wins_ref[pl.ds(c * SUB, SUB), :] = \
                        x2d_ref[pl.ds(wr, SUB), :]
                    return 0
                jax.lax.fori_loop(0, NB, fill, 0, unroll=True)
            # "none": skip fill (cost isolation)

            w = word_ref[:]
            rows = jax.lax.broadcasted_iota(jnp.int32, (NB * SUB, LANES), 0)
            base = rows // SUB * SUB
            if picks == 2:
                a = jnp.take_along_axis(wins_ref[:], base + ((w >> 7) & 0x7),
                                        axis=0)
                v = jnp.take_along_axis(a, w & 0x7F, axis=1) * val_ref[:]
            else:
                v = jnp.take_along_axis(wins_ref[:], w & 0x7F, axis=1) \
                    * val_ref[:]
            smax = smeta_ref[NB * SUB + NB]
            for k in range(scan_stages):
                @pl.when(k < smax + 100)   # always on (cost ceiling)
                def _(k=k):
                    guard = ((w >> (10 + k)) & 1) != 0
                    v = v  # noqa
                # NOTE: pl.when can't rebind v; do scan unconditionally
            for k in range(scan_stages):
                guard = ((w >> (10 + k)) & 1) != 0
                v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
            E = jnp.take_along_axis(v, (w >> 17) & 0x7F, axis=1)
            P = jnp.where(((w >> 24) & 1) != 0, E, 0.0)

            if place == "pick":
                R = jnp.take_along_axis(P, base + ((w >> 25) & 0x7), axis=0)
                R = jnp.where(((w >> 28) & 1) != 0, R, 0.0)
            elif place == "rolls":
                rcode = (w >> 25) & 0x7
                live = ((w >> 28) & 1) != 0
                R = jnp.where(live & (rcode == 0), P, 0.0)
                for r, wrap in ((1, 0), (7, 1), (2, 0)):
                    mask = live & (rcode == ((r + wrap) % 8))
                    Q = jnp.where(mask, P, 0.0)
                    shift = r if not wrap else NB * SUB - (SUB - r)
                    R = R + pltpu.roll(Q, shift, 0)
            else:
                R = P

            octv = (w >> 29) & 0x7
            if acc_mode == "octloop":
                def acc(c, _):
                    meta = smeta_ref[NB * SUB + c]
                    Rc = R[pl.dslice(c * SUB, SUB), :]
                    ov = octv[pl.dslice(c * SUB, SUB), :]
                    for o in range(octs):
                        acc_ref[o * SUB:(o + 1) * SUB, :] = (
                            acc_ref[o * SUB:(o + 1) * SUB, :]
                            + jnp.where(ov == o, Rc, 0.0))

                    @pl.when((meta & 1) == 1)
                    def _():
                        yb = meta >> 1
                        y_ref[pl.ds(yb, GSUB), :] = (
                            y_ref[pl.ds(yb, GSUB), :] + acc_ref[0:GSUB, :])
                        acc_ref[:] = jnp.zeros_like(acc_ref)
                    return 0
                jax.lax.fori_loop(0, NB, acc, 0, unroll=True)
            elif acc_mode == "plain8":
                def acc(c, _):
                    meta = smeta_ref[NB * SUB + c]
                    acc_ref[0:SUB, :] = (acc_ref[0:SUB, :]
                                         + R[pl.dslice(c * SUB, SUB), :])

                    @pl.when((meta & 1) == 1)
                    def _():
                        yb = meta >> 1
                        y_ref[pl.ds(yb, SUB), :] = (
                            y_ref[pl.ds(yb, SUB), :] + acc_ref[0:SUB, :])
                        acc_ref[0:SUB, :] = jnp.zeros((SUB, LANES),
                                                      jnp.float32)
                    return 0
                jax.lax.fori_loop(0, NB, acc, 0, unroll=True)
            else:  # "none": single write (floor)
                y_ref[0:SUB, :] = R[0:SUB, :]

        def f(v, w, x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((Y_ROWS, LANES), jnp.float32),
                grid=(NSTEPS,),
                in_specs=[sspec, vspec, vspec, xspec],
                out_specs=yspec,
                scratch_shapes=[
                    pltpu.VMEM((NB * SUB, LANES), jnp.float32),
                    pltpu.VMEM((GSUB, LANES), jnp.float32)],
                compiler_params=params)(smeta, w, v, x)

        def g(x, v, w):
            y = f(v, w, x)
            return x * (1.0 + y[0, 0] * 1e-37)
        return g

    def bench(name, **kw):
        try:
            t = measure_raw(make(**kw), x2d, vals, word)
            print(f"{name:<52} t={t*1e6:7.1f} us  {SLOTS/t/1e9:6.1f} Gslot/s"
                  f"  ({SLOTS*8/t/1e9:5.0f} GB/s @8B/slot)", flush=True)
        except Exception as e:
            print(f"{name:<52} FAILED {type(e).__name__}: {e}", flush=True)

    bench("V6 stream floor (no fill/pick/scan/acc)",
          fill_mode="none", picks=0, scan_stages=0, place="none",
          acc_mode="none")
    bench("V4 sellr-now shape (fill+1pick+scan3+plain acc)",
          fill_mode="row512", picks=1, scan_stages=3, place="rolls",
          acc_mode="plain8")
    bench("V1 sellrx (fill+2pick+scan3+placepick+octloop8)",
          fill_mode="row512", picks=2, scan_stages=3, place="pick",
          acc_mode="octloop", octs=8)
    bench("V1a sellrx octs=4",
          fill_mode="row512", picks=2, scan_stages=3, place="pick",
          acc_mode="octloop", octs=4)
    bench("V3 sellrx fill=chunk64",
          fill_mode="chunk64", picks=2, scan_stages=3, place="pick",
          acc_mode="octloop", octs=8)
    bench("V1-nofill (isolate fill)",
          fill_mode="none", picks=2, scan_stages=3, place="pick",
          acc_mode="octloop", octs=8)
    bench("V1-noacc (isolate octloop)",
          fill_mode="row512", picks=2, scan_stages=3, place="pick",
          acc_mode="none")
    bench("V1-scan5",
          fill_mode="row512", picks=2, scan_stages=5, place="pick",
          acc_mode="octloop", octs=8)
    bench("V1-rolls (place via 3 masked rolls)",
          fill_mode="row512", picks=2, scan_stages=3, place="rolls",
          acc_mode="octloop", octs=8)


if __name__ == "__main__":
    main()
