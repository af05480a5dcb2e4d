from clip_ppo_tpu.ops.severity import (
    SEVERITY_CONFIGS,
    DisturbanceParams,
    DisturbanceSeverity,
    resolve_params,
)
from clip_ppo_tpu.ops.disturbances import disturb, disturb_auto, disturb_uint8
from clip_ppo_tpu.ops.wrapper import (
    DisturbanceWrapper,
    DisturbanceWrapperGPU,
    create_disturbance_wrapper,
)

__all__ = [
    "SEVERITY_CONFIGS",
    "DisturbanceParams",
    "DisturbanceSeverity",
    "DisturbanceWrapper",
    "DisturbanceWrapperGPU",
    "create_disturbance_wrapper",
    "resolve_params",
    "disturb",
    "disturb_auto",
    "disturb_uint8",
]
