from .spectrum import (
    power_spectrum,
    power_spectrum_batch,
    calculate_power_spectrum_2d,
    calculate_power_spectrum_2d_batch,
)
from .resize import bilinear_resize, resize_maps
from .stats import pixel_pdf, compare_pdf_stats

__all__ = [
    "power_spectrum",
    "power_spectrum_batch",
    "calculate_power_spectrum_2d",
    "calculate_power_spectrum_2d_batch",
    "bilinear_resize",
    "resize_maps",
    "pixel_pdf",
    "compare_pdf_stats",
]
