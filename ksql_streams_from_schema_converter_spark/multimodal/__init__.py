from .binary import (  # noqa: F401
    MEDIA_SCHEMA,
    attach_fake_media,
    extract_media_features,
)
