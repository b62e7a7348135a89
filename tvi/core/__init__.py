from tvi.core.config import (  # noqa: F401
    UNetConfig,
    VAEConfig,
    CLIPVisionConfig,
    ControlNetConfig,
    SchedulerConfig,
    PipelineConfig,
    TrainConfig,
)
from tvi.core.precision import Policy, DEFAULT_POLICY  # noqa: F401
