"""Runtime layer: config, checkpointing, logging, profiling."""
from .config import DictConfig, get_basic_config, get_config, load_yaml
from .checkpoint import (CheckpointManager, load_states, load_torch_state_dict,
                         save_states)
from .logging import MetricLogger
from . import profiling

__all__ = [
    "DictConfig", "get_basic_config", "get_config", "load_yaml",
    "CheckpointManager", "load_states", "load_torch_state_dict",
    "save_states", "MetricLogger", "profiling",
]
