"""[EXT] Multimodal binary-column plumbing (decode / featurize / resize /
frame-sample as Arrow-batched UDFs; codecs stubbed, plumbing real)."""

from .media import (  # noqa: F401
    MEDIA_SCHEMA,
    DECODED_SCHEMA,
    synth_media,
    decode_media,
    media_features,
    resize_media,
    sample_frames,
)
