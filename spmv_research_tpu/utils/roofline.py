"""Per-format HBM roofline model.

The reference's ``mem_footprint`` / ``mem_ratio`` CSV columns
(``bench_spmv.cpp:479-480``) exist to support exactly this model: SpMV is
memory-bound, so speed-of-light time = bytes-touched / HBM bandwidth, and the
per-format bytes/nnz ratio decides which format wins.  BASELINE.md sets the
1-chip target as ≥80% of this roofline for CSR.

bytes(SpMV) = format footprint (streamed once)
            + x read (n·vb; assumes each x element is read ~once from HBM —
              post-RCM/σ-sort locality keeps re-reads in VMEM)
            + y write (m·vb).
"""

from __future__ import annotations

import dataclasses

import jax

# device_kind substring → (HBM GB/s, HBM GiB, peak f32 TFLOP/s)
_TPU_SPECS = {
    "v5 lite": (819e9, 16, 98.3),     # v5e (public spec: 819 GB/s, 197 bf16 TFLOPs)
    "v5e": (819e9, 16, 98.3),
    "v5p": (2765e9, 95, 229.5),
    "v4": (1228e9, 32, 137.5),
    "v6 lite": (1640e9, 32, 229.5),   # v6e / Trillium
    "v6e": (1640e9, 32, 229.5),
}

_DEFAULT = (819e9, 16, 98.3)


@dataclasses.dataclass
class DeviceSpec:
    kind: str
    hbm_bw: float       # bytes/s
    hbm_gib: float
    peak_tflops: float


def device_spec(device=None) -> DeviceSpec:
    if device is None:
        devs = jax.devices()
        device = devs[0]
    kind = getattr(device, "device_kind", "unknown").lower()
    for key, spec in _TPU_SPECS.items():
        if key in kind:
            return DeviceSpec(kind, *spec)
    return DeviceSpec(kind, *_DEFAULT)


def spmv_bytes(format_obj, value_bytes: int | None = None) -> int:
    """Bytes touched by one SpMV in the streaming model."""
    if value_bytes is None:
        values = None
        for attr in ("data", "vals", "diag", "lut"):
            values = getattr(format_obj, attr, None)
            if values is not None and hasattr(values, "dtype"):
                break
            values = None
        value_bytes = values.dtype.itemsize if values is not None else 4
    return (format_obj.mem_footprint_bytes()
            + format_obj.n * value_bytes + format_obj.m * value_bytes)


def spmv_roofline_time(format_obj, spec: DeviceSpec | None = None) -> float:
    spec = spec or device_spec()
    return spmv_bytes(format_obj) / spec.hbm_bw


def roofline_fraction(format_obj, measured_time: float,
                      spec: DeviceSpec | None = None) -> float:
    """achieved / speed-of-light (∈ (0, 1]; >1 would mean the model undercounts
    reuse, e.g. x fully cached in VMEM)."""
    return spmv_roofline_time(format_obj, spec) / measured_time


def csr_roofline_nnz_per_s(nnz: int, m: int, n: int, value_bytes: int,
                           spec: DeviceSpec | None = None) -> float:
    """Speed-of-light nnz/s for *CSR storage* (the BASELINE.md target metric),
    independent of the format actually used."""
    spec = spec or device_spec()
    csr_bytes = nnz * (value_bytes + 4) + (m + 1) * 4 + (m + n) * value_bytes
    return nnz / (csr_bytes / spec.hbm_bw)
