"""gsconverter_tpu — TPU-native Gaussian-splat processing & differentiable
rendering framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
francescofugazzi/3dgsconverter (reference mounted read-only at
/root/reference): N-to-N format conversion around a canonical SoA splat
pytree, fused sharded filters, Pallas hot kernels (SOR KNN, K-Means,
density), a tile-binned differentiable rasterizer, and multi-chip scaling
via jax.sharding meshes.
"""

from .cloud import SplatCloud, SH_C0
from .converter import Converter, convert
from .config import ConvertOptions

__version__ = "0.1.0"

__all__ = [
    "SplatCloud",
    "SH_C0",
    "Converter",
    "convert",
    "ConvertOptions",
    "__version__",
]
