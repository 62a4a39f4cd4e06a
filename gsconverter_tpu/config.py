"""Global configuration for gsconverter_tpu.

The reference keeps one module-level DEBUG flag
(/root/reference/gsconverter/utils/config.py:9) and threads every other
option through ``Converter.run(**kwargs)``.  We keep the same two module
flags for CLI parity and add a typed ``ConvertOptions`` dataclass that is the
single source of truth for the pipeline configuration (SURVEY.md §5
"one typed config object, same CLI flags").
"""

from __future__ import annotations

import dataclasses

# Module-level flags, set by the CLI (parity with reference utils/config.py).
DEBUG: bool = False
TIMING: bool = False


@dataclasses.dataclass
class ConvertOptions:
    """All pipeline options, mirroring the reference CLI flag surface
    (/root/reference/gsconverter/main.py:257-296)."""

    # Filters
    bbox: tuple[float, float, float, float, float, float] | None = None
    auto_bbox: bool = False
    min_opacity: int | None = None
    # Density filter (explicit params or sensitivity slider)
    density_voxel_size: float | None = None
    density_threshold: float | None = None
    density_sensitivity: float | None = None
    keep_multicluster: bool = False
    # SOR filter (explicit params or intensity slider)
    sor_k: int | None = None
    sor_sigma: float | None = None
    sor_intensity: float | None = None
    # SH handling
    sh_level: int | None = None
    crop_sh: bool = False
    # RGB synthesis
    rgb: bool = False
    # Format-specific
    compression_level: int = 0
    bucket_size: int | None = None
    block_size: float | None = None
    # Extra PLY element policy
    maintain_extra_elements: bool = False

    def any_filter_active(self) -> bool:
        return any(
            v is not None
            for v in (
                self.bbox,
                self.min_opacity,
                self.density_voxel_size,
                self.density_threshold,
                self.density_sensitivity,
                self.sor_k,
                self.sor_sigma,
                self.sor_intensity,
            )
        )
