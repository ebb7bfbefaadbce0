#!/usr/bin/env python
"""Stagewise timing breakdown of the CLOSG pallas SpMV pipeline on TPU.

Times cumulative pipeline prefixes differentially (long chains — short
chains are noise on this stack, see DESIGN_NOTES.md) so per-stage cost =
successive differences. Run: python tools/closg_probe.py
"""

import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from spmv_research_tpu.gen import generate_from_line
    from spmv_research_tpu.convert import rcm_reorder
    from spmv_research_tpu.convert.cache import cached_build
    from spmv_research_tpu.ops.clos_gather import (
        build_clos_gather, _windows, _gmul_r1_kernel, ClosG)
    from spmv_research_tpu.ops.clos_pallas import (
        _call, _invreg_kernel, _r3_scan_kernel_noval, _t_fwd, _t_bwd)
    from spmv_research_tpu.ops.clos_route import SUB, LANES
    from spmv_research_tpu.utils.timing import measure_op

    line = ("170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14"
            " scircuit_twin")
    host, _ = generate_from_line(line)
    host, _ = rcm_reorder(host)
    A = cached_build(build_clos_gather, host, "closg", dtype=jnp.float32)
    N, V = A.N, A.V
    S = SUB * V
    print(f"# N={N} V={V} C={A.C} scan_stages={A.scan_stages} "
          f"scan_hi={A.scan_hi.shape}", flush=True)

    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, host.n),
                    jnp.float32)

    def p_wins(x, A):
        return _windows(A, x)

    def p_gmul(x, A):
        return _call(partial(_gmul_r1_kernel, A.use_vlut), _windows(A, x),
                     A.perm_r1, A.vals_cs)

    def p_tf(x, A):
        return _t_fwd(p_gmul(x, A), V)

    def p_r2(x, A):
        return _call(_invreg_kernel, p_tf(x, A), A.perm_r2)

    def p_tb(x, A):
        return _t_bwd(p_r2(x, A), V)

    def p_r3(x, A):
        return _call(partial(_r3_scan_kernel_noval, (S, A.scan_stages)),
                     p_tb(x, A), A.perm_r3, A.scan_hi)

    def p_full(x, A):
        from spmv_research_tpu.ops.clos_gather import spmv_closg_pallas
        return spmv_closg_pallas(A, x)

    import dataclasses as dc
    A_noscan = dc.replace(A, scan_stages=(), scan_cap=())
    A_noext = dc.replace(A, yext_classes=((1, 0, 0, 0),))

    def p_full_in(x, A):
        from spmv_research_tpu.ops.clos_gather import spmv_closg_pallas
        return spmv_closg_pallas(A, x)

    n_batches = A.ysel_w.shape[0] // SUB
    A_w1 = dc.replace(A, yext_classes=((1, 0, n_batches, 0),))
    A_w3 = dc.replace(A, yext_classes=((3, 0, n_batches, 0),))
    stages = [("t_bwd", p_tb, A),
              ("r3scan", p_r3, A), ("full", p_full, A),
              ("full_noscan", p_full_in, A_noscan),
              ("full_noext", p_full_in, A_noext),
              ("full_allw1", p_full_in, A_w1),
              ("full_allw3", p_full_in, A_w3)]
    prev = 0.0
    for name, fn, fmt in stages:
        t = measure_op(fn, x, fmt, k_lo=16, k_hi=272, reps=3, warmup=1)
        print(f"{name:12s} cum={t*1e6:8.1f} us  delta={(t-prev)*1e6:8.1f} us",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
