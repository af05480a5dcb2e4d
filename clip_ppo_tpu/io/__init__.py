from clip_ppo_tpu.io.tb_writer import SummaryWriter, hyperparameters_table
from clip_ppo_tpu.io.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "SummaryWriter",
    "hyperparameters_table",
    "load_checkpoint",
    "save_checkpoint",
]
