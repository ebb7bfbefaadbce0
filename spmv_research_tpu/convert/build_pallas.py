"""Best-available TPU-native format selection for benchmarking.

Role of the reference's kernel-selection map (``config.sh:458-661`` ``progs``):
given a matrix, build the set of TPU-native formats worth benchmarking.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.host import HostCSR
from ..ops.bfly import build_bfly
from ..ops.clos import build_clos
from ..ops.clos_route import ClosRoutingError
from ..ops.routing import RoutingError
from .cache import cached_build


def build_best(host: HostCSR, dtype=jnp.float32) -> dict:
    """Return {name: format} candidates for this matrix (routed-engine builds
    are served from the on-disk format cache across runs). CLOS is the
    flagship (radix-1024 Clos routing, ~30x BFLY); BFLY remains the fallback
    for matrices whose slot space exceeds the Clos single-block cap."""
    out = {}
    try:
        out["CLOS"] = cached_build(build_clos, host, "clos", dtype=dtype)
    except ClosRoutingError:
        try:
            out["BFLY"] = cached_build(build_bfly, host, "bfly", dtype=dtype)
        except RoutingError:
            pass
    return out
