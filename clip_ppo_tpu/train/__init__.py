from clip_ppo_tpu.train.gae import compute_gae
from clip_ppo_tpu.train.ppo import CLIP_LOSS_FREQUENCY, PPOConfig, make_optimizer
from clip_ppo_tpu.train.host_runner import HostTrainer, HostTrainState
from clip_ppo_tpu.train.runner import LogPipeline, Trainer, TrainState, chunk_length

__all__ = [
    "CLIP_LOSS_FREQUENCY",
    "PPOConfig",
    "HostTrainState",
    "HostTrainer",
    "Trainer",
    "TrainState",
    "chunk_length",
    "LogPipeline",
    "compute_gae",
    "make_optimizer",
]
