from topic_store_spark.multimodal.binary import (
    attach_binary_metadata,
    decode_images,
    extract_image_features,
    frame_sample,
    resize_images,
)

__all__ = [
    "attach_binary_metadata",
    "decode_images",
    "extract_image_features",
    "frame_sample",
    "resize_images",
]
