from clip_ppo_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from clip_ppo_tpu.io.orbax_checkpoint import (
    load_checkpoint_orbax,
    save_checkpoint_orbax,
)
from clip_ppo_tpu.io.tb_writer import SummaryWriter, hyperparameters_table
from clip_ppo_tpu.io.tracking import ProfilerWindow, maybe_init_wandb
from clip_ppo_tpu.io.video import VideoRecorder, capped_cubic_video_schedule

__all__ = [
    "ProfilerWindow",
    "SummaryWriter",
    "VideoRecorder",
    "capped_cubic_video_schedule",
    "hyperparameters_table",
    "load_checkpoint",
    "load_checkpoint_orbax",
    "maybe_init_wandb",
    "save_checkpoint",
    "save_checkpoint_orbax",
]
