from . import expr, ir, mock  # noqa: F401
