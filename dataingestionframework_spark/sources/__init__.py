from .batch import read_batch
from .stream import read_stream

__all__ = ["read_batch", "read_stream"]
