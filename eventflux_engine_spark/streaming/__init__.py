"""Structured Streaming layer: sources, exactly-once sink, pipeline builders.

≙ reference runtime lifecycle (SURVEY.md §3): sources/junctions/sinks →
``readStream`` → declarative transformations → ``foreachBatch`` sink;
snapshot persistence (``src/core/persistence/snapshot_service.rs``) →
Structured Streaming checkpointing (free, including resume).
"""

from .sink import ExactlyOnceParquetSink
from .source import chunked_feed, stream_from_dir
from .registry import (
    create_sink,
    create_source,
    create_table,
    register_sink,
    register_source,
    register_table,
)

__all__ = [
    "ExactlyOnceParquetSink",
    "chunked_feed",
    "stream_from_dir",
    "register_source",
    "register_sink",
    "register_table",
    "create_source",
    "create_sink",
    "create_table",
]
