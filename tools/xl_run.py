#!/usr/bin/env python
"""XL-tier proof run: build CLOSGX for a >=100M-nnz synthetic matrix and
bench SpMV on the real TPU, emitting a CSV row (reference bar: the
kmer_V2a / cage15 tier, ``run.sh:137-191``).

Usage:
  python tools/xl_run.py [--name kmer_V2a] [--line "11 args"]
                         [--out out_logs_r4_xl]

Defaults to a 160M-nnz scattered-banded line sized for one v5e chip
(~2 GB of CLOSGX planes).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

DEFAULT_LINE = ("16000000 16000000 10.0 3.0 normal random 0.02 2.0 "
                "0.8 0.5 14 xl160m")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", help="twin name from validation_twins.txt")
    ap.add_argument("--line", default=DEFAULT_LINE)
    ap.add_argument("--out", default="out_logs_r4_xl")
    ap.add_argument("--chunk-n", type=int, default=1 << 20)
    args = ap.parse_args()

    line = args.line
    if args.name:
        for ln in open("datasets/validation_twins.txt"):
            if ln.strip().endswith(" " + args.name):
                line = ln.strip()
                break
        else:
            raise SystemExit(f"twin {args.name} not found")

    from spmv_research_tpu.gen import generate_from_line
    from spmv_research_tpu.ops.clos_xl import build_clos_gather_xl
    from spmv_research_tpu.ops import spmv
    from spmv_research_tpu.harness import BenchConfig, bench_spmv
    from spmv_research_tpu.harness.bench import (csv_labels,
                                                 csv_row_real)
    from spmv_research_tpu.utils import roofline as rl

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    host, feats = generate_from_line(line)
    name = line.split()[-1]
    print(f"# generated {name}: m={host.m} nnz={host.nnz} "
          f"({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    A = build_clos_gather_xl(host, chunk_N=args.chunk_n)
    t_build = time.time() - t0
    print(f"# CLOSGX build: {A.n_chunks} chunks x N={args.chunk_n} "
          f"({A.n_chunks*args.chunk_n/host.nnz:.2f} slots/nnz, "
          f"{t_build:.0f}s)", flush=True)

    cfg = BenchConfig(min_num_loops=16, min_time_s=0.5)
    r = bench_spmv(host, A, config=cfg, impl="pallas", matrix_name=name,
                   time_convert=t_build, time_convert_cold=t_build)
    spec = rl.device_spec()
    sol = rl.csr_roofline_nnz_per_s(host.nnz, host.m, host.n, 4, spec)
    print(json.dumps({
        "matrix": name, "m": host.m, "nnz": host.nnz,
        "format": "CLOSGX", "nnz_per_s": round(r.nnz_per_s / 1e9, 3),
        "gflops": round(r.gflops, 2),
        "median_us": round(r.time_iter_median * 1e6, 1),
        "roofline_frac": round(r.nnz_per_s / sol, 4),
        "mape": r.metrics.mape, "passed": r.metrics.passed,
        "build_s": round(t_build, 1),
    }), flush=True)
    csv_path = os.path.join(args.out, "closgx_spmv.csv")
    new = not os.path.exists(csv_path)
    with open(csv_path, "a") as f:
        if new:
            f.write(csv_labels(synthetic=False) + "\n")
        f.write(csv_row_real(r) + "\n")
    print(f"# wrote {csv_path}", flush=True)


if __name__ == "__main__":
    main()
