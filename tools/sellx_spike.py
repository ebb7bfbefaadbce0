#!/usr/bin/env python
"""SELLX kernel spike: GROUP=4096 rows (32 y2d), chunk = (8,128) slots
with 32 ARBITRARY window rows (per-row fill), 4-octet window pick +
select, lane pick, gated lane scan, single placement pick, quad(2-bit)
accumulate, per-group flush into the VMEM-resident y plane.

Usage: python tools/sellx_spike.py VARIANT [NB]
Variants: full, floor, noacc, now insel
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from spmv_research_tpu.utils.timing import measure_op  # noqa: E402

SUB, LANES = 8, 128
SPAN = 32
GSUB = 32
X_ROWS = 1344
Y_ROWS = 1344


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    NB = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    NSTEPS = max(1152 // NB, 1)
    NCH = NB * NSTEPS
    SLOTS = NCH * SUB * LANES
    SMEM_BLK = ((NB * SPAN + NB + 2 + 1023) // 1024) * 1024

    rng = np.random.default_rng(1)
    # word: c [0,7) u [7,12) guard [12,15) src [15,18) rlive [18] duo [19]
    c_f = rng.integers(0, 128, (NCH * SUB, LANES)).astype(np.uint32)
    u_f = rng.integers(0, SPAN, (NCH * SUB, LANES)).astype(np.uint32)
    g_f = ((rng.random((NCH * SUB, LANES, 3)) < 0.3)
           << np.arange(3)).sum(-1).astype(np.uint32)
    sA = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    rA = (rng.random((NCH * SUB, LANES)) < 0.7).astype(np.uint32)
    dA = rng.integers(0, 4, (NCH * SUB, LANES)).astype(np.uint32)
    word_np = (c_f | (u_f << 7) | (g_f << 12) | (sA << 15) | (rA << 18)
               | (dA << 19))
    word = jnp.asarray(word_np.view(np.int32))
    vals = jnp.asarray(rng.random((NCH * SUB, LANES), dtype=np.float32))
    x2d = jnp.asarray(rng.random((X_ROWS, LANES), dtype=np.float32))

    # smeta per step: [0,NB) span w0; [NB,2NB) chunk meta (ybase<<1|flush);
    # [2NB] smax
    smeta_np = np.zeros(NSTEPS * SMEM_BLK, np.int32)
    w0s = rng.integers(0, X_ROWS - 1, (NSTEPS, NB * SPAN)).astype(np.int32)
    ch = np.arange(NCH)
    ybase = (ch // 23) * GSUB % (Y_ROWS - GSUB)
    flush = ((ch % 23) == 22).astype(np.int32)
    for i in range(NSTEPS):
        s0 = i * SMEM_BLK
        smeta_np[s0:s0 + NB * SPAN] = w0s[i]
        smeta_np[s0 + NB * SPAN:s0 + NB * SPAN + NB] = \
            (ybase[i * NB:(i + 1) * NB] << 1) | flush[i * NB:(i + 1) * NB]
        smeta_np[s0 + NB * SPAN + NB] = 2
    smeta = jnp.asarray(smeta_np)

    def kernel(smeta_ref, word_ref, val_ref, x2d_ref, y_ref,
               wins_ref, acc_ref, r_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = word_ref[:]
        if variant == "floor":
            y_ref[0:SUB, :] = val_ref[0:SUB, :] + w[0:SUB, :]
            return

        # per-window fill: one row slice per window
        def fill(j, _):
            wr = smeta_ref[j]
            wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(wr, 1), :]
            return 0
        jax.lax.fori_loop(0, NB * SPAN, fill, 0, unroll=True)

        u = (w >> 7) & 0x1F
        ui = u & 0x7
        uoct = u >> 3
        if variant == "nowinsel":
            A = wins_ref[0:NB * SUB, :]
        else:
            picked = []
            for c in range(NB):
                ib = ui[c * SUB:(c + 1) * SUB, :]
                qs = [jnp.take_along_axis(
                    wins_ref[c * SPAN + q * SUB: c * SPAN + (q + 1) * SUB, :],
                    ib, axis=0) for q in range(4)]
                uo = uoct[c * SUB:(c + 1) * SUB, :]
                b0 = (uo & 1) == 1
                lo = jnp.where(b0, qs[1], qs[0])
                hi = jnp.where(b0, qs[3], qs[2])
                picked.append(jnp.where((uo >> 1) == 1, hi, lo))
            A = jnp.concatenate(picked, axis=0)
        v = jnp.take_along_axis(A, w & 0x7F, axis=1) * val_ref[:]

        smax = smeta_ref[NB * SPAN + NB]
        for k in range(3):
            guard = ((w >> (12 + k)) & 1) != 0
            v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)

        # placement
        src = (w >> 15) & 0x7
        rl = ((w >> 18) & 1) != 0
        picked = []
        for c in range(NB):
            blk = v[c * SUB:(c + 1) * SUB, :]
            ib = src[c * SUB:(c + 1) * SUB, :]
            picked.append(jnp.take_along_axis(blk, ib, axis=0))
        r_ref[:] = jnp.where(rl, jnp.concatenate(picked, axis=0), 0.0)

        if variant == "noacc":
            y_ref[0:SUB, :] = r_ref[0:SUB, :]
            return

        duo = (w >> 19) & 3
        for c in range(NB):
            meta = smeta_ref[NB * SPAN + c]
            Rc = r_ref[c * SUB:(c + 1) * SUB, :]
            dc = duo[c * SUB:(c + 1) * SUB, :]
            for q in range(4):
                acc_ref[q * SUB:(q + 1) * SUB, :] = (
                    acc_ref[q * SUB:(q + 1) * SUB, :]
                    + jnp.where(dc == q, Rc, 0.0))

            @pl.when((meta & 1) == 1)
            def _():
                yb = meta >> 1
                y_ref[pl.ds(yb, GSUB), :] = (y_ref[pl.ds(yb, GSUB), :]
                                             + acc_ref[:])
                acc_ref[:] = jnp.zeros_like(acc_ref)

    params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    blk = lambda i: (i, 0)  # noqa: E731
    vspec = pl.BlockSpec((NB * SUB, LANES), blk, memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((SMEM_BLK,), lambda i: (i,), memory_space=pltpu.SMEM)
    xspec = pl.BlockSpec((X_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    yspec = pl.BlockSpec((Y_ROWS, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    def f(v, w, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Y_ROWS, LANES), jnp.float32),
            grid=(NSTEPS,),
            in_specs=[sspec, vspec, vspec, xspec],
            out_specs=yspec,
            scratch_shapes=[pltpu.VMEM((NB * SPAN, LANES), jnp.float32),
                            pltpu.VMEM((GSUB, LANES), jnp.float32),
                            pltpu.VMEM((NB * SUB, LANES), jnp.float32)],
            compiler_params=params)(smeta, w, v, x)

    def g(x, v, w):
        y = f(v, w, x)
        return x * (1.0 + y[0, 0] * 1e-37)

    t = measure_op(g, x2d, vals, word, k_lo=8, k_hi=264)
    print(f"{variant:<10} NB={NB}: t={t*1e6:7.1f} us  "
          f"{SLOTS/t/1e9:6.1f} Gslot/s "
          f"(scircuit@1.25slots: {SLOTS/1.25/t/1e9:5.1f} Gnnz/s)",
          flush=True)


if __name__ == "__main__":
    main()
