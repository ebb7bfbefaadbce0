#!/usr/bin/env python
"""SELLRX kernel-shape spike v2 — ONE variant per invocation (the v1 spike
compiled 9 giant programs in one process and wedged the remote worker).

Usage: python tools/sellrx_spike_v2.py VARIANT [k_hi]

Variants:
  floor     stream floor: word+word2+vals DMA only, trivial use
  sellr     current-SELLR shape (1 pick, scan3, rolls place, plain acc)
  x1        SELLRX: fill + 2-stage gather + scan3 + eidx + 1 place plane + octloop
  x2        SELLRX: ... + 2 place planes + octloop both
  x2t       like x2 but acc via per-chunk tile-broadcast masks
  x2s       like x2 but acc full-step vectorized (group-aligned steps)
  noacc     x2 without acc (isolate acc cost)
  nofill    x2 without fill
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
NB = 64
NSTEPS = 18
NCH = NB * NSTEPS
X_ROWS = 1344
Y_ROWS = 1344
GSUB = 64
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


def build_inputs():
    rng = np.random.default_rng(1)
    # word: c [0,7) u [7,10) guard [10,13) eidx [13,20) emask [20]
    #       srcA [21,24) rliveA [24] octA [25,28)
    c_f = rng.integers(0, 128, (NCH * SUB, LANES)).astype(np.uint32)
    u_f = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    g_f = ((rng.random((NCH * SUB, LANES, 3)) < 0.3)
           << np.arange(3)).sum(-1).astype(np.uint32)
    e_f = rng.integers(0, 128, (NCH * SUB, LANES)).astype(np.uint32)
    em_f = (rng.random((NCH * SUB, LANES)) < 0.8).astype(np.uint32)
    sA = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    rA = (rng.random((NCH * SUB, LANES)) < 0.7).astype(np.uint32)
    oA = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    word_np = (c_f | (u_f << 7) | (g_f << 10) | (e_f << 13) | (em_f << 20)
               | (sA << 21) | (rA << 24) | (oA << 25))
    # word2 int32: srcB [0,3) rliveB [3] octB [4,7)
    sB = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    rB = (rng.random((NCH * SUB, LANES)) < 0.25).astype(np.uint32)
    oB = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    word2_np = (sB | (rB << 3) | (oB << 4))
    word = jnp.asarray(word_np.view(np.int32))
    word2 = jnp.asarray(word2_np.view(np.int32))
    vals = jnp.asarray(rng.random((NCH * SUB, LANES), dtype=np.float32))
    x2d = jnp.asarray(rng.random((X_ROWS, LANES), dtype=np.float32))

    smeta_np = np.zeros(NSTEPS * SMEM_BLK, np.int32)
    wrow = rng.integers(0, X_ROWS - 8, NCH * SUB).astype(np.int32)
    ch = np.arange(NCH)
    # ~3 steps per group (group-aligned for the x2s variant: flush at step end)
    ybase = (ch // (3 * NB)) * GSUB % (Y_ROWS - GSUB)
    flush = ((ch % (3 * NB)) == (3 * NB - 1)).astype(np.int32)
    for i in range(NSTEPS):
        s0 = i * SMEM_BLK
        smeta_np[s0: s0 + NB * SUB] = wrow[i * NB * SUB:(i + 1) * NB * SUB]
        smeta_np[s0 + NB * SUB: s0 + NB * SUB + NB] = \
            (ybase[i * NB:(i + 1) * NB] << 1) | flush[i * NB:(i + 1) * NB]
        smeta_np[s0 + NB * SUB + NB] = 3  # smax
    smeta = jnp.asarray(smeta_np)
    return smeta, word, word2, vals, x2d


def make(variant):
    do_fill = variant != "nofill"
    two_stage = variant != "sellr"
    nplace = {"x1": 1, "floor": 0, "sellr": 1}.get(variant, 2)
    acc_mode = {"floor": "none", "sellr": "plain8", "noacc": "none",
                "x2t": "tile", "x2s": "step"}.get(variant, "octloop")

    def kernel(smeta_ref, word_ref, word2_ref, val_ref, x2d_ref, y_ref,
               wins_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = word_ref[:]
        w2 = word2_ref[:]
        if variant == "floor":
            y_ref[0:SUB, :] = (val_ref[0:SUB, :] + w[0:SUB, :]
                               + w2[0:SUB, :])
            return

        if do_fill:
            def fill(j, _):
                wr = smeta_ref[j]
                wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(wr, 1), :]
                return 0
            jax.lax.fori_loop(0, NB * SUB, fill, 0, unroll=True)

        rows = jax.lax.broadcasted_iota(jnp.int32, (NB * SUB, LANES), 0)
        base = rows // SUB * SUB
        if two_stage:
            a = jnp.take_along_axis(wins_ref[:], base + ((w >> 7) & 0x7),
                                    axis=0)
            v = jnp.take_along_axis(a, w & 0x7F, axis=1) * val_ref[:]
        else:
            v = jnp.take_along_axis(wins_ref[:], w & 0x7F, axis=1) \
                * val_ref[:]
        smax = smeta_ref[NB * SUB + NB]
        for k in range(3):
            guard = ((w >> (10 + k)) & 1) != 0
            v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)
        E = jnp.take_along_axis(v, (w >> 13) & 0x7F, axis=1)
        P = jnp.where(((w >> 20) & 1) != 0, E, 0.0)

        planes = []
        if variant == "sellr":
            rcode = (w >> 21) & 0x7
            live = ((w >> 24) & 1) != 0
            R = jnp.where(live & (rcode == 0), P, 0.0)
            for r, wrap in ((1, 0), (7, 1)):
                mask = live & (rcode == (r | (wrap << 2)) % 8)
                Q = jnp.where(mask, P, 0.0)
                shift = r if not wrap else NB * SUB - (SUB - r)
                R = R + pltpu.roll(Q, shift, 0)
            planes = [(R, (w >> 25) & 0x7)]
        else:
            if nplace >= 1:
                RA = jnp.take_along_axis(P, base + ((w >> 21) & 0x7), axis=0)
                RA = jnp.where(((w >> 24) & 1) != 0, RA, 0.0)
                planes.append((RA, (w >> 25) & 0x7))
            if nplace >= 2:
                RB = jnp.take_along_axis(P, base + (w2 & 0x7), axis=0)
                RB = jnp.where(((w2 >> 3) & 1) != 0, RB, 0.0)
                planes.append((RB, (w2 >> 4) & 0x7))

        if acc_mode == "none":
            R0 = planes[0][0] if planes else P
            y_ref[0:SUB, :] = R0[0:SUB, :]
        elif acc_mode == "plain8":
            R0 = planes[0][0]

            def acc(c, _):
                meta = smeta_ref[NB * SUB + c]
                acc_ref[0:SUB, :] = (acc_ref[0:SUB, :]
                                     + R0[pl.dslice(c * SUB, SUB), :])

                @pl.when((meta & 1) == 1)
                def _():
                    yb = meta >> 1
                    y_ref[pl.ds(yb, SUB), :] = (y_ref[pl.ds(yb, SUB), :]
                                                + acc_ref[0:SUB, :])
                    acc_ref[0:SUB, :] = jnp.zeros((SUB, LANES), jnp.float32)
                return 0
            jax.lax.fori_loop(0, NB, acc, 0, unroll=True)
        elif acc_mode == "octloop":
            def acc(c, _):
                meta = smeta_ref[NB * SUB + c]
                for R, octv in planes:
                    Rc = R[pl.dslice(c * SUB, SUB), :]
                    ov = octv[pl.dslice(c * SUB, SUB), :]
                    for o in range(8):
                        acc_ref[o * SUB:(o + 1) * SUB, :] = (
                            acc_ref[o * SUB:(o + 1) * SUB, :]
                            + jnp.where(ov == o, Rc, 0.0))

                @pl.when((meta & 1) == 1)
                def _():
                    yb = meta >> 1
                    y_ref[pl.ds(yb, GSUB), :] = (y_ref[pl.ds(yb, GSUB), :]
                                                 + acc_ref[:])
                    acc_ref[:] = jnp.zeros_like(acc_ref)
                return 0
            jax.lax.fori_loop(0, NB, acc, 0, unroll=True)
        elif acc_mode == "tile":
            def acc(c, _):
                meta = smeta_ref[NB * SUB + c]
                roct = jax.lax.broadcasted_iota(
                    jnp.int32, (GSUB, LANES), 0) // SUB
                for R, octv in planes:
                    Rc = R[pl.dslice(c * SUB, SUB), :]
                    ov = octv[pl.dslice(c * SUB, SUB), :]
                    G = jnp.concatenate([Rc] * 8, axis=0)
                    OG = jnp.concatenate([ov] * 8, axis=0)
                    acc_ref[:] = acc_ref[:] + jnp.where(OG == roct, G, 0.0)

                @pl.when((meta & 1) == 1)
                def _():
                    yb = meta >> 1
                    y_ref[pl.ds(yb, GSUB), :] = (y_ref[pl.ds(yb, GSUB), :]
                                                 + acc_ref[:])
                    acc_ref[:] = jnp.zeros_like(acc_ref)
                return 0
            jax.lax.fori_loop(0, NB, acc, 0, unroll=True)
        elif acc_mode == "step":
            # full-step: mask per octet over the whole plane, tree-reduce
            # the 64 chunk planes, add into acc; flush on last chunk's bit
            for R, octv in planes:
                for o in range(8):
                    M = jnp.where(octv == o, R, 0.0)
                    Ms = M.reshape(NB, SUB, LANES).sum(axis=0)
                    acc_ref[o * SUB:(o + 1) * SUB, :] = (
                        acc_ref[o * SUB:(o + 1) * SUB, :] + Ms)
            meta = smeta_ref[NB * SUB + NB - 1]

            @pl.when((meta & 1) == 1)
            def _():
                yb = meta >> 1
                y_ref[pl.ds(yb, GSUB), :] = (y_ref[pl.ds(yb, GSUB), :]
                                             + acc_ref[:])
                acc_ref[:] = jnp.zeros_like(acc_ref)

    return kernel


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "x2"
    k_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 136
    smeta, word, word2, vals, x2d = build_inputs()
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((NB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((SMEM_BLK,), lambda i: (i,), memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec((X_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((Y_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    kernel = make(variant)

    def f(v, w, w2, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Y_ROWS, LANES), jnp.float32),
            grid=(NSTEPS,),
            in_specs=[sspec, vspec, vspec, vspec, xspec],
            out_specs=yspec,
            scratch_shapes=[pltpu.VMEM((NB * SUB, LANES), jnp.float32),
                            pltpu.VMEM((GSUB, LANES), jnp.float32)],
            compiler_params=params)(smeta, w, w2, v, x)

    def g(x, v, w, w2):
        y = f(v, w, w2, x)
        return x * (1.0 + y[0, 0] * 1e-37)

    t = measure_raw(g, x2d, vals, word, word2, k_hi=k_hi)
    print(f"{variant:<10} t={t*1e6:7.1f} us  {SLOTS/t/1e9:6.1f} Gslot/s  "
          f"({SLOTS*12/t/1e9:5.0f} GB/s @12B/slot)", flush=True)


if __name__ == "__main__":
    main()
