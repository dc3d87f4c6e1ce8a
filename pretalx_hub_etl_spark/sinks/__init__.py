from .base import CollectingSink, ParquetSink, Sink
from .manifest import CommitLog
from .merge import MergeSink
from .mor import MorTable
from .validate import validate_split, with_validity

__all__ = [
    "CollectingSink",
    "CommitLog",
    "MergeSink",
    "MorTable",
    "ParquetSink",
    "Sink",
    "validate_split",
    "with_validity",
]
