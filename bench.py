#!/usr/bin/env python
"""Driver benchmark: CSR SpMV roofline fraction on the scircuit twin.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

metric: fraction of the CSR-storage HBM roofline achieved by the best
available SpMV implementation on a SuiteSparse-twin synthetic matrix
(scircuit twin — parameters from the reference's twin table,
``benchmark_code/BENCH/config.sh:399-455``; real SuiteSparse downloads are
unavailable in this zero-egress container).

vs_baseline = value / 0.80 (the BASELINE.md 1-chip target: ≥80% of the
CSR HBM roofline).

Round-2 rework (VERDICT.md item 2): every candidate is timed through ONE
dynamic-k differential chain (single compile — round 1 lost ~1000 s to
three separate chain compiles of the CLOSG pipeline), slow baselines get
adaptively shortened chains, compile time is reported per candidate, and
the roofline definition is the CSR-storage one everywhere.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import os
    import jax
    import jax.numpy as jnp

    from spmv_research_tpu.gen import generate_from_line
    from spmv_research_tpu.convert import build_csr
    from spmv_research_tpu.convert.reorder import rcm_if_beneficial
    from spmv_research_tpu.ops import available_impls
    from spmv_research_tpu.harness import BenchConfig, bench_spmv
    from spmv_research_tpu.utils import roofline as rl

    # scircuit twin (reference twin-parameter table format)
    line = ("170998 170998 5.6 4.39 normal random 0.297 61.9 0.803 0.633 14 "
            "scircuit_twin")
    t_all = time.time()
    host, feats = generate_from_line(line)
    log(f"# generated twin ({time.time()-t_all:.1f}s)")
    t0 = time.time()
    host, _ = rcm_if_beneficial(host)
    log(f"# rcm-if-beneficial ({time.time()-t0:.1f}s)")

    spec = rl.device_spec()
    dtype = jnp.float32
    sol_nnz_s = rl.csr_roofline_nnz_per_s(host.nnz, host.m, host.n,
                                          np.dtype("float32").itemsize, spec)

    cfg = BenchConfig(min_num_loops=64, min_time_s=1.0)
    # The r3 driver run burned its whole 400 s budget on the fresh-process
    # TPU handshake (10-25 min) and skipped the CSR/xla baseline, losing
    # the speedup column (VERDICT r3 weak #7). The handshake happens
    # before the first dispatch regardless — budget what remains, and the
    # full candidate list costs only ~50 s once the client is warm.
    BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1800))

    t0 = time.time()
    fmts = {"CSR": (build_csr(host, dtype=dtype),
                    {"build_s": 0.0, "cold_build_s": 0.0,
                     "from_cache": False})}
    try:
        from spmv_research_tpu.convert.build_pallas import build_best
        fmts.update(build_best(host, dtype=dtype))
    except ImportError:
        pass
    log(f"# formats built: {sorted(fmts)} ({time.time()-t0:.1f}s)")

    # candidate order: TPU-native engines FIRST (the headline), then the
    # CSR/xla baseline for the speedup column. Engines run pallas only —
    # their xla lowering hits the serialized-gather path.
    order = []
    for name, (A, info) in fmts.items():
        for impl in available_impls("spmv", A.format_name):
            if (name == "CSR") != (impl == "xla"):
                continue
            order.append((name, A, impl, info))
    order.sort(key=lambda t: t[0] == "CSR")

    candidates = []
    for name, A, impl, info in order:
        elapsed = time.time() - t_all
        log(f"# starting {name}/{impl} (elapsed {elapsed:.0f}s)")
        if candidates and elapsed > BUDGET_S:
            log(f"# budget exceeded, skipping {name}/{impl}")
            continue
        try:
            r = bench_spmv(host, A, config=cfg, impl=impl,
                           matrix_name="scircuit_twin",
                           time_convert=info["build_s"],
                           time_convert_cold=info["cold_build_s"])
        except Exception as e:
            log(f"# {name}/{impl} failed: {type(e).__name__}: {e}")
            continue
        candidates.append((r.nnz_per_s, name, impl, r))
        log(f"# {name}/{impl}: {r.nnz_per_s/1e9:.3f} Gnnz/s "
            f"median={r.time_iter_median*1e6:.0f}us mape={r.metrics.mape:.2e} "
            f"compile={r.time_compile:.1f}s convert={info['build_s']:.1f}s "
            f"convert_cold={info['cold_build_s']:.1f}s "
            f"(elapsed {time.time()-t_all:.0f}s)")

    if not candidates:
        print(json.dumps({"metric": "csr_spmv_roofline_frac", "value": 0.0,
                          "unit": "fraction", "vs_baseline": 0.0}))
        return

    candidates.sort(reverse=True, key=lambda t: t[0])
    nnz_s, name, impl, r = candidates[0]
    base = [c for c in candidates if c[1] == "CSR"]
    speedup = round(nnz_s / base[0][0], 2) if base else None
    frac = nnz_s / sol_nnz_s
    print(json.dumps({
        "metric": "csr_spmv_roofline_frac",
        "value": round(frac, 5),
        "unit": "fraction_of_hbm_roofline",
        "vs_baseline": round(frac / 0.80, 5),
        "detail": {
            "matrix": "scircuit_twin", "m": host.m, "nnz": host.nnz,
            "best_format": name, "best_impl": impl,
            "nnz_per_s": round(nnz_s / 1e9, 4),
            "gflops": round(r.gflops, 3),
            "roofline_nnz_per_s": round(sol_nnz_s / 1e9, 4),
            "device": spec.kind,
            "mape": r.metrics.mape,
            "time_compile_s": round(r.time_compile, 1),
            "time_convert_s": round(r.time_convert, 1),
            "time_convert_cold_s": round(r.time_convert_cold, 1),
            "total_runtime_s": round(time.time() - t_all, 1),
            "speedup_vs_xla_tpu_baseline": speedup,
            "candidates": {
                f"{n}/{i}": round(s / 1e9, 4) for (s, n, i, _) in candidates
            },
        },
    }))


if __name__ == "__main__":
    main()
