"""Structured-Streaming surface.

Mirrors the reference's streaming model (SURVEY.md §2.6): streaming writes
are micro-batch table writes (``ds/HoodieStreamingSink.scala:41-140``),
streaming reads are incremental pulls whose offsets are commit timestamps
(``sql/hudi/streaming/HoodieStreamSource.scala:50-144``), and the
DeltaStreamer ingest driver stores its source checkpoint inside commit
metadata (``util/deltastreamer/DeltaSync.java``).
"""

from .delta_streamer import DeltaStreamer, MultiTableDeltaStreamer
from .sink import last_committed_batch_id, write_stream
from .source import HudiStreamDataSource, incremental_batches, read_stream

__all__ = [
    "DeltaStreamer",
    "MultiTableDeltaStreamer",
    "HudiStreamDataSource",
    "incremental_batches",
    "last_committed_batch_id",
    "read_stream",
    "write_stream",
]
