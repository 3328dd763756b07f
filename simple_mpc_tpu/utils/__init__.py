from . import checkpoint, metrics
from .friction import FrictionCompensation
from .interpolator import Interpolator

__all__ = ["FrictionCompensation", "Interpolator", "checkpoint", "metrics"]
