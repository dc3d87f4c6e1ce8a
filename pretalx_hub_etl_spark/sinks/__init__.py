from .base import CollectingSink, ParquetSink, Sink
from .validate import validate_split, with_validity

__all__ = ["CollectingSink", "ParquetSink", "Sink", "validate_split", "with_validity"]
