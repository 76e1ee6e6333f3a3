from . import align  # noqa: F401
