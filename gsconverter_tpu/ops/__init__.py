from . import quant, sh  # noqa: F401
