from vectorsearch_scylla_spark.multimodal.media import (
    MEDIA_SCHEMA,
    documents_as_media,
    extract_byte_features,
    sample_frames,
    audio_pcm_features,
    sniff_image_meta,
    sniff_av_container,
    decode_image,
)

__all__ = [
    "MEDIA_SCHEMA",
    "documents_as_media",
    "extract_byte_features",
    "sample_frames",
    "audio_pcm_features",
    "sniff_image_meta",
    "sniff_av_container",
    "decode_image",
]
