from . import roofline
from . import timing
from . import plot
