"""Shared foreachBatch writer plumbing for the streaming entries.

Every streaming surface in the engine (Replayer.stream, the windowed
aggregate sink, the patch sink, the transactional router) is the same
shape: a foreachBatch sink over a checkpoint with either an
availableNow (drain) or processing-time trigger. One helper so a
trigger/checkpoint-option change lands in one place.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def start_foreach_batch(
    df: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    *,
    output_mode: str | None = None,
    available_now: bool = False,
    trigger_seconds: int = 10,
):
    """Start ``df.writeStream.foreachBatch(sink)`` with the engine's
    standard checkpoint + trigger wiring; returns the StreamingQuery."""
    writer = df.writeStream
    if output_mode is not None:
        writer = writer.outputMode(output_mode)
    writer = writer.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
