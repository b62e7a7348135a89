from tvi.ops.attention import dot_product_attention, AttnStats  # noqa: F401
from tvi.ops.resize import resize_with_antialiasing, bicubic_resize  # noqa: F401
from tvi.ops.slerp import slerp  # noqa: F401
