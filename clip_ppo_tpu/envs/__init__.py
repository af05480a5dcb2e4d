from clip_ppo_tpu.envs.atari.vector import AtariVectorEnv, AtariVecState
from clip_ppo_tpu.envs.vector import JaxVectorEnv, VecState


def make_vector_env(env_id: str, num_envs: int, **kwargs):
    """Dispatch an env id to the matching pure-JAX vector env
    (MiniGrid-* → JaxVectorEnv, ALE/* & *NoFrameskip* → AtariVectorEnv)."""
    if env_id.startswith("MiniGrid"):
        return JaxVectorEnv(env_id, num_envs, **kwargs)
    return AtariVectorEnv(env_id, num_envs, **kwargs)


__all__ = [
    "AtariVecState",
    "AtariVectorEnv",
    "JaxVectorEnv",
    "VecState",
    "make_vector_env",
]
