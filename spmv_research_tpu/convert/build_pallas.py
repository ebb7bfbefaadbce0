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
from ..ops.clos_gather import build_clos_gather_auto as build_clos_gather
from ..ops.clos_route import ClosRoutingError
from ..ops.routing import RoutingError
from ..ops.sellr import SellRBuildError, build_sellr
from ..ops.sellw import SellWBuildError, build_sellw
from .cache import cached_build


def build_best(host: HostCSR, dtype=jnp.float32) -> dict:
    """Return {name: format} candidates for this matrix (routed-engine builds
    are served from the on-disk format cache across runs). SELLW is the
    column-locality engine (one fused kernel, ~2x CLOSG on banded
    matrices); its builder raises on matrices without locality. CLOSG is
    the general flagship (row-gather front end + Clos perm/compact, ~20x
    BFLY); CLOS is the fallback when the column-block padding overflows the
    slot space; BFLY when even the exact-Clos slot space overflows its
    cap."""
    out = {}
    try:
        out["SELLR"] = cached_build(build_sellr, host, "sellr", dtype=dtype)
    except SellRBuildError:
        pass
    try:
        out["SELLW"] = cached_build(build_sellw, host, "sellw", dtype=dtype)
    except SellWBuildError:
        pass
    try:
        out["CLOSG"] = cached_build(build_clos_gather, host, "closg",
                                    dtype=dtype)
        return out
    except ClosRoutingError:
        pass
    try:
        out["CLOS"] = cached_build(build_clos, host, "clos", dtype=dtype)
    except ClosRoutingError:
        try:
            out["BFLY"] = cached_build(build_bfly, host, "bfly", dtype=dtype)
        except RoutingError:
            pass
    return out
