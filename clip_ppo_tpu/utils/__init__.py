from clip_ppo_tpu.utils import flags

__all__ = ["flags"]
