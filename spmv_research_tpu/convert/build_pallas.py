"""Best-available TPU-native format selection for benchmarking.

Role of the reference's kernel-selection map (``config.sh:458-661`` ``progs``):
given a matrix, build the set of TPU-native formats worth benchmarking.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.host import HostCSR
from ..ops.bfly import build_bfly
from ..ops.routing import RoutingError
from .cache import cached_build


def build_best(host: HostCSR, dtype=jnp.float32) -> dict:
    """Return {name: format} candidates for this matrix (BFLY builds are
    served from the on-disk format cache across runs)."""
    out = {}
    try:
        out["BFLY"] = cached_build(build_bfly, host, "bfly", dtype=dtype)
    except RoutingError:
        pass
    return out
