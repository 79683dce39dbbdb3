from .resize import (  # noqa: F401
    resize_bilinear_align_corners,
    resize_bicubic_half_pixel,
    upsample2x_align_corners,
    linear_resize_matrix,
    cubic_resize_matrix,
)
from .attention import mha, temporal_mha  # noqa: F401
