# NOTE: keep this namespace lazy — utils.config imports models (which import
# utils.torch_init); eager re-exports here would create an import cycle.
from imagefolder_tpu.utils.logging import MetricLogger, Tracker, create_logger

__all__ = ["MetricLogger", "Tracker", "create_logger"]
