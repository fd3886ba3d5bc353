from . import op_derive  # noqa: F401
