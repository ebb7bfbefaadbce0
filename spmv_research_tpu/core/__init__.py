from .host import HostCOO, HostCSR
from . import formats
