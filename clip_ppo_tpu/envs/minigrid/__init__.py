from clip_ppo_tpu.envs.minigrid import core

__all__ = ["core"]
