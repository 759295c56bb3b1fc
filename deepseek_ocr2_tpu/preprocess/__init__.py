from .image import (  # noqa: F401
    auto_rotate_choice,
    dynamic_preprocess,
    find_closest_aspect_ratio,
    images_to_nchw,
    images_to_u8_nchw,
    pad_to_square,
    rotate_image,
    should_crop,
)
