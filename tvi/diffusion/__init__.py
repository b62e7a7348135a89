from tvi.diffusion.edm import (  # noqa: F401
    EDMConstants,
    edm_preconditioning,
    edm_loss_weight,
    rand_cosine_interpolated,
    sigma_to_timestep,
)
from tvi.diffusion.euler import EulerDiscreteScheduler  # noqa: F401
from tvi.diffusion.guidance import frame_guidance_scale  # noqa: F401
