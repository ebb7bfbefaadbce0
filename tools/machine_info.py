#!/usr/bin/env python
"""Dump device/topology info — role of the reference's machines_info/
(lstopo + lscpu dumps): what hardware did these numbers come from."""
import json
import sys

sys.path.insert(0, ".")


def main():
    import jax
    from spmv_research_tpu.utils.roofline import device_spec

    devs = jax.devices()
    spec = device_spec()
    info = {
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "devices": [str(d) for d in devs],
        "device_kind": devs[0].device_kind if devs else None,
        "hbm_bw_GBps": spec.hbm_bw / 1e9,
        "hbm_GiB": spec.hbm_gib,
        "peak_f32_tflops": spec.peak_tflops,
        "process_count": jax.process_count(),
    }
    print(json.dumps(info, indent=2))


if __name__ == "__main__":
    main()
