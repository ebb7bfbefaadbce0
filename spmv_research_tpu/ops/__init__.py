from .dispatch import spmv, spmm, sddmm, available_impls
from . import reference  # registers the XLA implementations
