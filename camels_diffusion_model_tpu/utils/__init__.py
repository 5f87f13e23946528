from .run_logging import RunLogger, log_device_used
from .image_norm import unorm, norm_all, norm_batch, gen_tst_context
from . import viz

__all__ = [
    "RunLogger",
    "log_device_used",
    "viz",
    "unorm",
    "norm_all",
    "norm_batch",
    "gen_tst_context",
]
