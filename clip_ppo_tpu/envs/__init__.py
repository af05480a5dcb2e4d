from clip_ppo_tpu.envs.vector import JaxVectorEnv, VecState

__all__ = ["JaxVectorEnv", "VecState"]
