from .binary import (  # noqa: F401
    DHASH_SCHEMA,
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    RESIZED_SCHEMA,
    attach_fake_media,
    extract_media_features,
    near_dup_pairs,
    perceptual_dhash,
    resize_media,
    sample_frames,
)
