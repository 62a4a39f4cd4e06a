from .log import debug_print, status_print  # noqa: F401
