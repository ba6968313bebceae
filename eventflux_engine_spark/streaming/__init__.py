"""Structured Streaming layer: sources, exactly-once sink, pipeline builders.

≙ reference runtime lifecycle (SURVEY.md §3): sources/junctions/sinks →
``readStream`` → declarative transformations → ``foreachBatch`` sink;
snapshot persistence (``src/core/persistence/snapshot_service.rs``) →
Structured Streaming checkpointing (free, including resume).
"""

from .sink import ExactlyOnceParquetSink
from .source import chunked_feed, stream_from_dir

__all__ = ["ExactlyOnceParquetSink", "chunked_feed", "stream_from_dir"]
