"""Format codec registry — importing this package registers all codecs."""

from .base import BaseFormat, get_handler, known_formats
from .ply_gs import Ply3DGSFormat, PlyCCFormat
from .splat import SplatFormat

# Imported for registration side effects; optional deps degrade gracefully.
from . import spz  # noqa: F401
from . import compressed_ply  # noqa: F401
from . import ksplat  # noqa: F401
from . import parquet  # noqa: F401
from . import sog  # noqa: F401

__all__ = [
    "BaseFormat",
    "get_handler",
    "known_formats",
    "Ply3DGSFormat",
    "PlyCCFormat",
    "SplatFormat",
]
