from .binary import (  # noqa: F401
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    RESIZED_SCHEMA,
    attach_fake_media,
    extract_media_features,
    resize_media,
    sample_frames,
)
