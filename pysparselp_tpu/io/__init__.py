from .mps import mps_parser, save_mps
from .netlib import get_problem

__all__ = ["mps_parser", "save_mps", "get_problem"]
