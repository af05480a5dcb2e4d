from clip_ppo_tpu.ops.severity import (
    SEVERITY_CONFIGS,
    DisturbanceParams,
    DisturbanceSeverity,
    resolve_params,
)
from clip_ppo_tpu.ops.disturbances import disturb, disturb_uint8

__all__ = [
    "SEVERITY_CONFIGS",
    "DisturbanceParams",
    "DisturbanceSeverity",
    "resolve_params",
    "disturb",
    "disturb_uint8",
]
