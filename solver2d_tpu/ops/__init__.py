from . import math2d  # noqa: F401
