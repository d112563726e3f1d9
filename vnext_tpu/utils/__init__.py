from .registry import Registry
from .logger import setup_logger, log_first_n, log_every_n, log_every_n_seconds
from .events import (
    EventStorage,
    EventWriter,
    JSONWriter,
    CommonMetricPrinter,
    TensorboardWriter,
    get_event_storage,
    has_event_storage,
)

__all__ = [
    "Registry",
    "setup_logger",
    "log_first_n",
    "log_every_n",
    "log_every_n_seconds",
    "EventStorage",
    "EventWriter",
    "JSONWriter",
    "CommonMetricPrinter",
    "TensorboardWriter",
    "get_event_storage",
    "has_event_storage",
]
