from .dispatch import spmv, spmm, sddmm, available_impls
from . import reference  # registers the XLA implementations
from . import bfly       # registers BFLY xla impl
from . import bfly_pallas  # registers BFLY pallas impl
from .bfly import build_bfly, Bfly
from .spgemm import spgemm, spgemm_symbolic, SpGEMMPlan
from .value_compress import CSRLUT, build_csr_lut
