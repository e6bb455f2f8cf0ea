"""[EXT] Multimodal binary-column plumbing (decode / featurize /
frame-sample as Arrow-batched UDFs; codecs stubbed, plumbing real)."""

from .media import (  # noqa: F401
    MEDIA_SCHEMA,
    DECODED_SCHEMA,
    synth_media,
    decode_media,
    media_features,
    sample_frames,
)
