"""Config, logging, checkpointing."""

from .config import load_config, validate_config, run_name
from .logging import initialize_logger, MetricsWriter
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "load_config",
    "validate_config",
    "run_name",
    "initialize_logger",
    "MetricsWriter",
    "save_checkpoint",
    "load_checkpoint",
]
