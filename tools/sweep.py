#!/usr/bin/env python
"""CLI sweep driver — the run.sh analog.

Usage:
  python tools/sweep.py --matrices twins.txt --formats csr bfly \
      --workloads spmv spmm --out out_logs
  python tools/sweep.py --matrix "2000 2000 10 3 normal random 0.3 2 0.5 0.3 14 demo"

Matrix list files: one entry per line — a .mtx path or an 11-arg synthetic
parameter line (matrix_generation_parameters format).
"""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--matrices", help="file with one matrix spec per line")
    ap.add_argument("--matrix", action="append", default=[],
                    help="inline matrix spec (repeatable)")
    ap.add_argument("--formats", nargs="+", default=["csr", "bfly"])
    ap.add_argument("--workloads", nargs="+", default=["spmv"])
    ap.add_argument("--impls", nargs="+", default=None)
    ap.add_argument("--out", default="out_logs")
    args = ap.parse_args()

    from spmv_research_tpu.harness import run_sweep, BenchConfig

    specs = list(args.matrix)
    if args.matrices:
        with open(args.matrices) as f:
            specs += [ln.strip() for ln in f
                      if ln.strip() and not ln.startswith("#")]
    if not specs:
        ap.error("no matrices given")
    run_sweep(specs, formats=args.formats, workloads=args.workloads,
              impls=args.impls, out_dir=args.out,
              config=BenchConfig.from_env())


if __name__ == "__main__":
    main()
