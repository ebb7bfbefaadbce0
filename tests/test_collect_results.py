"""Results merge: NaN-accuracy rows must never reach the corpus CSVs."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_nan_rows_dropped(tmp_path):
    out = tmp_path / "logs"
    out.mkdir()
    (out / "x_trisolve.csv").write_text(
        "matrix_name,format_name,impl,K,gflops,mape\n"
        "good,F,xla,0,1.0,1e-8\n"
        "bad,F,xla,0,1.0,nan\n")
    (out / "y_spmv.csv").write_text(
        "matrix_name,format_name,spmv_mape,gflops,roofline_frac\n"
        "m1,CSR_xla,2e-8,0.1,0.001\n"
        "m2,ENG_pallas,-nan,9.9,0.2\n")
    from collect_results import merge
    merged, best = merge([str(out)], results_dir=str(tmp_path / "res"))
    tri = {k[0] for k in merged["trisolve"]}
    spmv = {k[0] for k in merged["spmv"]}
    assert tri == {"good"}
    assert spmv == {"m1"}


def test_last_dir_wins(tmp_path):
    a = tmp_path / "a"; a.mkdir()
    b = tmp_path / "b"; b.mkdir()
    hdr = "matrix_name,format_name,impl,K,gflops,mape\n"
    (a / "x_spmm.csv").write_text(hdr + "m,F,xla,64,1.0,1e-8\n")
    (b / "x_spmm.csv").write_text(hdr + "m,F,xla,64,2.0,1e-8\n")
    from collect_results import merge
    merged, _ = merge([str(a), str(b)], results_dir=str(tmp_path / "res"))
    (row,) = merged["spmm"].values()
    assert row["gflops"] == "2.0"
