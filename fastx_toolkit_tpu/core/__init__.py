from .records import ReadBatch, BaseCode  # noqa: F401
from .errors import FastxError  # noqa: F401
