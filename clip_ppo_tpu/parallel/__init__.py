from clip_ppo_tpu.parallel.distributed import global_mesh, initialize_distributed
from clip_ppo_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_env_state,
)
from clip_ppo_tpu.parallel.tp import (
    clip_param_shardings,
    clip_param_specs,
    shard_clip_params,
)

__all__ = [
    "batch_sharding",
    "clip_param_shardings",
    "clip_param_specs",
    "global_mesh",
    "initialize_distributed",
    "make_mesh",
    "replicate_tree",
    "replicated",
    "shard_clip_params",
    "shard_env_state",
]
