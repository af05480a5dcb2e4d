from clip_ppo_tpu.models.agent import (
    AblationMode,
    cnn_features,
    evaluate_actions,
    get_action_and_value,
    get_latent_representation,
    get_value,
    init_agent_params,
)
from clip_ppo_tpu.models import clip_utils

__all__ = [
    "clip_utils",
    "AblationMode",
    "cnn_features",
    "evaluate_actions",
    "get_action_and_value",
    "get_latent_representation",
    "get_value",
    "init_agent_params",
]
