from flingbot_tpu.utils.config import config_parser, seed_all
from flingbot_tpu.utils.stats import collect_stats, get_dataset_size
from flingbot_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "config_parser",
    "seed_all",
    "collect_stats",
    "get_dataset_size",
    "save_checkpoint",
    "load_checkpoint",
]
