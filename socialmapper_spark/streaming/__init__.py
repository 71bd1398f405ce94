"""Structured Streaming surface.

The reference has no event-time streaming (SURVEY.md §2.10); this package
exists for the engine's training-data-pipeline extensions: watermarked
tumbling-window rollups whose batch twin is the correctness oracle. See
:mod:`socialmapper_spark.operators.events` for the implementations.
"""

from socialmapper_spark.operators.events import (
    sessionize,
    window_rollup,
    window_rollup_stream,
)

__all__ = ["sessionize", "window_rollup", "window_rollup_stream"]
