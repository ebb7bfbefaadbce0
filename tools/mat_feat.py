#!/usr/bin/env python
"""Matrix feature extractor CLI — role of the reference's
validation_matrices/matrix_features/mat_feat.cpp: read a matrix, print its
structural features and the 11-arg synthetic-twin parameter line."""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("matrix", help=".mtx path or 11-arg synthetic line")
    ap.add_argument("--rcm", action="store_true", help="apply RCM first")
    ap.add_argument("--spy", help="save spy plot to this path")
    args = ap.parse_args()

    from spmv_research_tpu.harness import BenchConfig
    from spmv_research_tpu.harness.sweep import load_matrix
    from spmv_research_tpu.convert import extract_features, rcm_reorder

    cfg = BenchConfig()
    cfg.use_rcm_reordering = args.rcm
    host, name, _ = load_matrix(args.matrix, cfg)
    f = extract_features(host)
    for field in ("m", "n", "nnz", "density", "mem_footprint_mb", "mem_range",
                  "nnz_per_row_min", "nnz_per_row_max", "nnz_per_row_avg",
                  "nnz_per_row_std", "bw_avg", "bw_scaled_avg", "scatter_avg",
                  "skew", "num_neighbours_avg", "cross_row_similarity_avg"):
        print(f"{field:28s} {getattr(f, field)}")
    print("twin line:", " ".join(str(v) for v in f.twin_params()), name)
    if args.spy:
        from spmv_research_tpu.utils.plot import save_spy
        save_spy(host, args.spy, title=name)
        print("spy plot:", args.spy)


if __name__ == "__main__":
    main()
