#!/usr/bin/env python
"""SELLRX kernel spike v3 — refined scattered-engine shape, ONE variant
per invocation, at scircuit-twin scale.

Design (see sellrx_pack_sim2 for the packing side):
  * group = 8192 rows (64 y2d rows); chunk = (8,128) slots, group-pure;
  * W=32 fill windows per chunk (4 octets of 8 x2d rows), gather =
    per-octet 8-deep sublane pick + select tree + ONE lane pick;
  * segments END-ALIGNED at their target lane (no eidx pick);
  * placement: 2 oct-keyed planes (A: oct<4, B: oct>=4), per-chunk
    8-deep pick to target sublane + rlive mask;
  * acc: per chunk 4 oct tests per plane into (64,128) group acc,
    flushed to the VMEM-resident y plane per group.

Usage: python tools/sellrx_spike_v3.py VARIANT [NB] [W]
Variants: full, noacc, nowinsel (W=8 single-pick), noplace, floor
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from spmv_research_tpu.utils.timing import measure_op  # noqa: E402

SUB, LANES = 8, 128
GSUB = 64
X_ROWS = 1344
Y_ROWS = 1344


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    NB = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    NQ = W // 8
    NSTEPS = max(1408 // NB, 1)
    NCH = NB * NSTEPS
    SLOTS = NCH * SUB * LANES
    SMEM_BLK = ((NB * W + NB + 2 + 1023) // 1024) * 1024

    rng = np.random.default_rng(1)
    # word: c [0,7) u [7,12) guard [12,15) srcA [15,18) rlA [18]
    #       octA [19,21) srcB [21,24) rlB [24] octB [25,27)
    c_f = rng.integers(0, 128, (NCH * SUB, LANES)).astype(np.uint32)
    u_f = rng.integers(0, W, (NCH * SUB, LANES)).astype(np.uint32)
    g_f = ((rng.random((NCH * SUB, LANES, 3)) < 0.3)
           << np.arange(3)).sum(-1).astype(np.uint32)
    sA = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    rA = (rng.random((NCH * SUB, LANES)) < 0.5).astype(np.uint32)
    oA = rng.integers(0, 4, (NCH * SUB, LANES)).astype(np.uint32)
    sB = rng.integers(0, 8, (NCH * SUB, LANES)).astype(np.uint32)
    rB = (rng.random((NCH * SUB, LANES)) < 0.5).astype(np.uint32)
    oB = rng.integers(0, 4, (NCH * SUB, LANES)).astype(np.uint32)
    word_np = (c_f | (u_f << 7) | (g_f << 12) | (sA << 15) | (rA << 18)
               | (oA << 19) | (sB << 21) | (rB << 24) | (oB << 25))
    word = jnp.asarray(word_np.view(np.int32))
    vals = jnp.asarray(rng.random((NCH * SUB, LANES), dtype=np.float32))
    x2d = jnp.asarray(rng.random((X_ROWS, LANES), dtype=np.float32))

    # smeta per step: [0, NB*W) fill rows (region-major: q*NB*8 + c*8 + s);
    # [NB*W, NB*W+NB) chunk meta (ybase<<1 | flush); [+NB] smax
    smeta_np = np.zeros(NSTEPS * SMEM_BLK, np.int32)
    fill_rows = rng.integers(0, X_ROWS - 1, (NSTEPS, NB * W)).astype(np.int32)
    ch = np.arange(NCH)
    ybase = (ch // 48) * GSUB % (Y_ROWS - GSUB)
    flush = ((ch % 48) == 47).astype(np.int32)
    for i in range(NSTEPS):
        s0 = i * SMEM_BLK
        smeta_np[s0: s0 + NB * W] = fill_rows[i]
        smeta_np[s0 + NB * W: s0 + NB * W + NB] = \
            (ybase[i * NB:(i + 1) * NB] << 1) | flush[i * NB:(i + 1) * NB]
        smeta_np[s0 + NB * W + NB] = 2
    smeta = jnp.asarray(smeta_np)

    def kernel(smeta_ref, word_ref, val_ref, x2d_ref, y_ref,
               wins_ref, acc_ref, ra_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            y_ref[:] = jnp.zeros_like(y_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = word_ref[:]
        if variant == "floor":
            y_ref[0:SUB, :] = val_ref[0:SUB, :] + w[0:SUB, :]
            return

        # fill: wins region layout rows q*(NB*8) + c*8 + s
        def fill(j, _):
            wr = smeta_ref[j]
            wins_ref[pl.ds(j, 1), :] = x2d_ref[pl.ds(wr, 1), :]
            return 0
        jax.lax.fori_loop(0, NB * W, fill, 0, unroll=True)

        # gather: per-chunk per-octet 8-deep pick, select tree, lane pick
        u = (w >> 7) & 0x1F
        if variant == "nowinsel":
            A = wins_ref[0: NB * SUB, :]
        else:
            uo = u >> 3
            ui = u & 0x7
            parts = []
            for q in range(NQ):
                picked = []
                for c in range(NB):
                    blk = wins_ref[(q * NB + c) * SUB:(q * NB + c + 1) * SUB, :]
                    ib = ui[c * SUB:(c + 1) * SUB, :]
                    picked.append(jnp.take_along_axis(blk, ib, axis=0))
                parts.append(jnp.concatenate(picked, axis=0))
            if NQ == 4:
                b0 = (uo & 1) == 1
                lo = jnp.where(b0, parts[1], parts[0])
                hi = jnp.where(b0, parts[3], parts[2])
                A = jnp.where((uo >> 1) == 1, hi, lo)
            elif NQ == 2:
                A = jnp.where((uo & 1) == 1, parts[1], parts[0])
            else:
                A = parts[0]
        v = jnp.take_along_axis(A, w & 0x7F, axis=1) * val_ref[:]

        smax = smeta_ref[NB * W + NB]
        for k in range(3):
            guard = ((w >> (12 + k)) & 1) != 0
            v = v + jnp.where(guard, pltpu.roll(v, 1 << k, 1), 0.0)

        if variant == "noplace":
            y_ref[0:SUB, :] = v[0:SUB, :]
            return

        # placement planes (per-chunk 8-deep pick to target sublane)
        ra_list = []
        for (soff, roff) in ((15, 18), (21, 24)):
            src = (w >> soff) & 0x7
            rl = ((w >> roff) & 1) != 0
            picked = []
            for c in range(NB):
                blk = v[c * SUB:(c + 1) * SUB, :]
                ib = src[c * SUB:(c + 1) * SUB, :]
                picked.append(jnp.take_along_axis(blk, ib, axis=0))
            R = jnp.where(rl, jnp.concatenate(picked, axis=0), 0.0)
            ra_list.append(R)
        ra_ref[:] = ra_list[0]
        octA_ = (w >> 19) & 0x3
        octB_ = (w >> 25) & 0x3
        RB = ra_list[1]

        if variant == "noacc":
            y_ref[0:SUB, :] = ra_ref[0:SUB, :] + RB[0:SUB, :]
            return

        for c in range(NB):
            meta = smeta_ref[NB * W + c]
            RAc = ra_ref[c * SUB:(c + 1) * SUB, :]
            oAc = octA_[c * SUB:(c + 1) * SUB, :]
            oBc = octB_[c * SUB:(c + 1) * SUB, :]
            RBc = RB[c * SUB:(c + 1) * SUB, :]
            for o in range(4):
                acc_ref[o * SUB:(o + 1) * SUB, :] = (
                    acc_ref[o * SUB:(o + 1) * SUB, :]
                    + jnp.where(oAc == o, RAc, 0.0))
                acc_ref[(4 + o) * SUB:(5 + o) * SUB, :] = (
                    acc_ref[(4 + o) * SUB:(5 + o) * SUB, :]
                    + jnp.where(oBc == o, RBc, 0.0))

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
            scratch_shapes=[pltpu.VMEM((NB * W, LANES), jnp.float32),
                            pltpu.VMEM((GSUB, LANES), jnp.float32),
                            pltpu.VMEM((NB * SUB, LANES), jnp.float32)],
            compiler_params=params)(smeta, w, v, x)

    def g(x, v, w):
        y = f(v, w, x)
        return x * (1.0 + y[0, 0] * 1e-37)

    t = measure_op(g, x2d, vals, word, k_lo=8, k_hi=264)
    print(f"{variant:<10} NB={NB} W={W}: t={t*1e6:7.1f} us  "
          f"{SLOTS/t/1e9:6.1f} Gslot/s "
          f"(scircuit@1.5slots: {SLOTS/1.5/t/1e9:5.1f} Gnnz/s)", flush=True)


if __name__ == "__main__":
    main()
