from .timers import CheckDecrease, Chrono
from .xorshift import XorShift

__all__ = ["Chrono", "CheckDecrease", "XorShift"]
