from clip_ppo_tpu.models.agent import (
    AblationMode,
    cnn_features,
    evaluate_actions,
    get_action_and_value,
    get_latent_representation,
    get_value,
    init_agent_params,
)

__all__ = [
    "AblationMode",
    "cnn_features",
    "evaluate_actions",
    "get_action_and_value",
    "get_latent_representation",
    "get_value",
    "init_agent_params",
]
