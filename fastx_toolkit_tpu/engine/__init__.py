from .pipeline import to_device, bucket_shape  # noqa: F401
