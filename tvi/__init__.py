"""tvi — TPU-native timelapse / two-frame video interpolation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
dreamyou070/Timelapse_Video_Interpolation (Framer-style interactive frame
interpolation on Stable Video Diffusion, plus the vendored
svd-temporal-controlnet sub-project), designed TPU-first:

- models are flax.linen modules in NHWC layout (XLA-friendly conv layouts),
  bf16 compute / fp32 params by default,
- the denoising loop is a single jitted ``lax.scan``/``fori_loop`` program,
- data parallelism is a ``jax.sharding.Mesh`` + NamedSharding (collectives
  emitted by XLA over ICI), not NCCL,
- hot ops (temporal/spatial attention, GroupNorm+SiLU) have fused Pallas
  TPU kernels with XLA fallbacks,
- attention statistics (the reference's monkey-patch instrumentation,
  src/train_decouples.py:375-545) are first-class functional aux outputs.

Reference parity citations in docstrings point into /root/reference/.
"""

__version__ = "0.1.0"

from tvi.core import config  # noqa: F401
