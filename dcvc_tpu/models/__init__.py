from .dmci import DMCI
from . import common

__all__ = ["DMCI", "common"]
