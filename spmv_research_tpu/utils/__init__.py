from . import roofline
