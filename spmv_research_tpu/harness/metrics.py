"""Accuracy metrics and the differential-validation gate.

Reimplements the reference's per-run golden check (``bench_spmv.cpp:108-235``)
and the 8 error metrics of ``lib/array_metrics.c`` exactly:

* gate: ``max over i with y_gold[i] > ε of |y_gold[i]−y[i]| / |y_gold[i]| ≤ ε``
  with ε = 1e-7 (fp32 kernels) / 1e-10 (fp64 kernels) — ``bench_spmv.cpp:114-119,198``.
* mae, max_ae, mse: plain absolute/squared error moments (``array_metrics.c:1477-1595``).
* mape  = mean(|a−f| / max(|a|, ε_mach))            (``:1648-1654``)
* smape = mean(|a−f| / max(|a|+|f|, ε_mach))        (``:1759-1765``)
* lnQ_error = mean(log10 max(|f|,ε) − log10 max(|a|,ε))  (``:1930-1939``)
* mlare = log10 |10^lnQ − 1|                        (``:2023-2029``)
* gmare = 10^mlare                                  (``:2139-2144``)

The gold y is computed in extended precision (numpy longdouble + Kahan), the
analog of the reference's ``_Float128`` gold (``bench_spmv.cpp:61-64``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

DBL_EPSILON = np.finfo(np.float64).eps

EPSILON_GATE = {np.dtype(np.float32): 1e-7, np.dtype(np.float64): 1e-10}


@dataclasses.dataclass
class ErrorMetrics:
    mae: float
    max_ae: float
    mse: float
    mape: float
    smape: float
    lnQ_error: float
    mlare: float
    gmare: float
    max_rel_err: float  # the gate quantity
    passed: bool

    def as_csv_fields(self):
        return [self.mae, self.max_ae, self.mse, self.mape, self.smape,
                self.lnQ_error, self.mlare, self.gmare]


def error_metrics(y_gold: np.ndarray, y_test: np.ndarray,
                  epsilon: float) -> ErrorMetrics:
    a = np.asarray(y_gold, dtype=np.float64)
    f = np.asarray(y_test, dtype=np.float64)
    ae = np.abs(a - f)
    mae = float(ae.mean()) if a.size else 0.0
    max_ae = float(ae.max()) if a.size else 0.0
    mse = float((ae * ae).mean()) if a.size else 0.0
    mape = float((ae / np.maximum(np.abs(a), DBL_EPSILON)).mean()) if a.size else 0.0
    smape = float((ae / np.maximum(np.abs(a) + np.abs(f), DBL_EPSILON)).mean()) if a.size else 0.0
    lnq = float((np.log10(np.maximum(np.abs(f), DBL_EPSILON))
                 - np.log10(np.maximum(np.abs(a), DBL_EPSILON))).mean()) if a.size else 0.0
    with np.errstate(divide="ignore"):
        mlare = float(np.log10(np.abs(np.power(np.longdouble(10.0), np.longdouble(lnq)) - 1)))
    gmare = float(10.0 ** mlare)
    # the gate: relative error only where gold magnitude exceeds epsilon
    sig = a > epsilon  # reference uses (y_gold > epsilon), signed, as-is
    max_rel = float((ae[sig] / np.abs(a[sig])).max()) if np.any(sig) else 0.0
    return ErrorMetrics(
        mae=mae, max_ae=max_ae, mse=mse, mape=mape, smape=smape,
        lnQ_error=lnq, mlare=mlare, gmare=gmare,
        max_rel_err=max_rel, passed=bool(max_rel <= epsilon),
    )


def check_accuracy(csr, x: np.ndarray, y_test: np.ndarray,
                   value_dtype=np.float32) -> ErrorMetrics:
    """Golden differential check against extended-precision CSR SpMV.

    `csr` is a HostCSR holding the *original* (f64) values — the gold uses
    these, not the dtype-rounded kernel inputs, matching the reference
    (``bench_spmv.cpp:61-64``: gold on ValueTypeReference=double input).
    """
    eps = EPSILON_GATE[np.dtype(value_dtype)]
    max_len = int(csr.row_lengths().max()) if csr.m else 0
    if csr.nnz > 2_000_000 or max_len > 4096:
        y_gold = csr.spmv_gold_fast(x)
    else:
        y_gold = _gold_vec_kahan(csr, x)
    return error_metrics(np.asarray(y_gold, dtype=np.float64),
                         np.asarray(y_test), eps)


def _gold_vec_kahan(csr, x: np.ndarray) -> np.ndarray:
    """Vectorized longdouble Kahan-compensated row sums."""
    ld = np.longdouble
    prod = csr.a.astype(ld) * x.astype(ld)[csr.ja]
    m = csr.m
    lengths = csr.row_lengths()
    y = np.zeros(m, dtype=ld)
    max_len = int(lengths.max()) if m else 0
    # Kahan over the k-th element of every row simultaneously
    comp = np.zeros(m, dtype=ld)
    starts = csr.ia[:-1].astype(np.int64)
    for k in range(max_len):
        active = lengths > k
        idx = starts[active] + k
        val = prod[idx] - comp[active]
        tmp = y[active] + val
        comp[active] = (tmp - y[active]) - val
        y[active] = tmp
    return y
