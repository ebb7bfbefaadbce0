from .config import BenchConfig
from .metrics import ErrorMetrics, error_metrics, check_accuracy, EPSILON_GATE
from .bench import (
    BenchResult, bench_spmv, csv_labels, csv_row_real, csv_row_synthetic, emit,
)
from .workloads import bench_spmm, bench_sddmm, bench_cg, WorkloadResult
from .sweep import run_sweep, load_matrix, FORMAT_BUILDERS
