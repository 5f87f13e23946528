from .run_logging import RunLogger, log_device_used
from . import viz

__all__ = ["RunLogger", "log_device_used", "viz"]
