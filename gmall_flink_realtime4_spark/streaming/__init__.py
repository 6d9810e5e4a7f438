"""Structured Streaming execution layer (SURVEY.md §2.9).

Pipelines in this engine are source/sink-agnostic DataFrame transforms; this
package runs them as micro-batch streaming queries — the streaming twin of
the batch plans the oracle gate verifies. Batch/stream parity is Spark's
unified-semantics guarantee; tests/test_streaming.py asserts it per
operator class (windows A2-A5, dedup A8, stateful W10, joins J1/J3).
"""

from .runner import (  # noqa: F401
    run_to_memory,
    stream_from_dataframe,
    stream_parquet_source,
)
