from . import transforms, stats  # noqa: F401
